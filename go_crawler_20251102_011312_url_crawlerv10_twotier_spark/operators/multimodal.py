"""Multimodal column plumbing for a training-data pipeline.

Media payloads are opaque ``binary`` columns + typed metadata structs;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.
The image/audio codec libraries are NOT in this container, so the
decode kernels are STUBBED (clearly marked below): ``probe_media``
detects container magic bytes and byte-level stats (real), while
``decode_features`` returns a deterministic fake feature vector unless
``strict=True``, in which case it raises NotImplementedError at the
point a real codec would be called. The Spark-side plumbing — schema,
batch iteration, partition-parallel shape — is real and tested.

At 100 TB the payloads dominate IO: keep them in their own parquet
column chunk (they compress/skip independently), filter on the typed
metadata FIRST (codegen-side predicate: mime, byte length) so the
binary column is only materialized for surviving rows, and size
``spark.sql.files.maxPartitionBytes`` for payload-heavy row groups.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),  # RIFF container (wav/avi; refined by fourcc)
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp boxes start with size prefix
)


def sniff_mime_py(payload: bytes | None) -> str:
    if not payload:
        return "application/octet-stream"
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


PROBE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, sha1 string, hex_md5 string"
)


def probe_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Partition-parallel media probe: magic-byte mime sniff + size +
    content hashes. Entirely real (no codec needed).

    Two digests: ``sha1`` over the raw bytes (the production content
    key), and ``hex_md5`` = md5 over the UPPERCASE hex encoding of the
    bytes. The latter exists for independent verification: the DuckDB
    oracle's ``md5()`` only accepts VARCHAR, and uppercase hex is the
    canonical injective blob->varchar map both engines share
    (``hex()``), so ``md5(hex(payload))`` commits to every byte and is
    reproducible on both sides.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": [sniff_mime_py(p) for p in payloads],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha1": [
                        hashlib.sha1(p).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "hex_md5": [
                        hashlib.md5(p.hex().upper().encode()).hexdigest()
                        if p is not None
                        else None
                        for p in payloads
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, PROBE_SCHEMA)


FEATURE_DIM = 16
FEATURES_SCHEMA = "doc_id long, mime string, features array<float>"


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
    normalize: bool = False,
) -> DataFrame:
    """Decode + feature-extract stage.

    STUB: a real deployment decodes the payload (PIL/ffmpeg) and runs a
    featurizer here; this container has neither, so with strict=False a
    deterministic byte-histogram sketch stands in (stable across runs,
    so tests can assert on it); strict=True raises where the codec
    call would happen, making the stub impossible to mistake for a
    real decoder.

    With ``normalize=False`` (default) the features are the RAW bin
    counts (whole numbers, exactly representable in float32) so the
    correctness gate can hash them bit-for-bit against a SQL oracle;
    ``normalize=True`` emits the L1-normalized histogram a real
    featurizer shape would have (floats — not exactly comparable
    cross-engine, covered by pytest instead).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            mimes = []
            for p in pdf[payload_col]:
                mime = sniff_mime_py(p)
                mimes.append(mime)
                if strict:
                    raise NotImplementedError(
                        "media decode requires codec libraries not present "
                        "in this container (PIL/ffmpeg); plumbing is real, "
                        "kernel is stubbed"
                    )
                # deterministic fake: 16-bin byte histogram
                hist = [0.0] * FEATURE_DIM
                if p:
                    for byte in p[:4096]:
                        hist[byte % FEATURE_DIM] += 1.0
                    if normalize:
                        s = sum(hist) or 1.0
                        hist = [round(v / s, 6) for v in hist]
                feats.append(hist)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "mime": mimes, "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(op, FEATURES_SCHEMA)


FRAME_BYTES = 256
FRAME_STRIDE = 4
FRAMES_SCHEMA = "doc_id long, frame_idx int, n_frames int, frame_md5 string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame-sampling stage (video keyframe extraction shape): split
    the payload into fixed ``frame_bytes`` chunks and keep every
    ``stride``-th — one OUTPUT ROW PER SAMPLED FRAME (the explode
    shape downstream featurizers consume).

    STUB note: a real deployment seeks container keyframes with ffmpeg
    here; the fixed chunk grid stands in for it. Everything Spark-side
    is real — mapInPandas batch iteration, the 1:N row fan-out, the
    per-frame digest (md5 over uppercase hex, the blob->varchar map
    shared with the DuckDB oracle).

    At 100 TB: frame rows are tiny (digests, not bytes), so the
    fan-out multiplies row COUNT, not data volume; the payload column
    never leaves this stage.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, digests = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                n_frames = max(1, -(-len(p) // frame_bytes))
                for i in range(0, n_frames, stride):
                    chunk = p[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n_frames)
                    digests.append(
                        hashlib.md5(chunk.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                    "frame_md5": pd.Series(digests, dtype=object),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, FRAMES_SCHEMA)


def features_digest(features_df: DataFrame) -> DataFrame:
    """Gate-comparable projection of ``decode_features`` output: the
    array<float> column is unhashable for a row-canonicalizing
    comparator, so collapse it to scalars — its length and the md5 of
    the comma-joined integer counts (exact: counts are whole numbers)."""
    counts_str = F.col("features").cast("array<int>").cast("array<string>")
    return features_df.select(
        "doc_id",
        "mime",
        F.size("features").alias("n_features"),
        F.md5(F.concat_ws(",", counts_str)).alias("features_md5"),
    )


def attach_fake_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic binary payload synth for tests: a fake 'media'
    blob with a real magic header chosen by id, body from the text."""
    magic = (
        F.when(F.col(id_col) % 3 == 0, F.lit(bytes(b"\x89PNG\r\n\x1a\n")))
        .when(F.col(id_col) % 3 == 1, F.lit(bytes(b"\xff\xd8\xff\xe0")))
        .otherwise(F.lit(bytes(b"RIFF")))
    )
    return df.withColumn(
        "payload", F.concat(magic, F.encode(F.col(text_col), "utf-8"))
    )
