"""Multimodal column plumbing for a training-data pipeline.

Media payloads are opaque ``binary`` columns + typed metadata structs;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.
``probe_media`` detects container magic bytes and byte-level stats
(real). ``decode_features`` carries TWO kernel tiers:

* REAL pure-python decoders for PNG (zlib inflate + unfilter, stdlib
  only) and RIFF/WAV PCM (header walk + int16 samples) — structure
  features from actually-decoded pixels/samples;
* a deterministic byte-histogram STUB for every other container
  (JPEG/GIF/MP4 need codec libraries this container lacks — with
  ``strict=True`` those raise instead of silently faking).

The Spark-side plumbing — schema, batch iteration, partition-parallel
shape — is identical for both tiers and fully tested.

At 100 TB the payloads dominate IO: keep them in their own parquet
column chunk (they compress/skip independently), filter on the typed
metadata FIRST (codegen-side predicate: mime, byte length) so the
binary column is only materialized for surviving rows, and size
``spark.sql.files.maxPartitionBytes`` for payload-heavy row groups.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"BM", "image/bmp"),
    (b"RIFF", "audio/wav"),  # RIFF container (wav/avi; refined by fourcc)
    (b"FORM", "audio/aiff"),  # IFF container (aiff/aifc; refined by fourcc)
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

# Decoded-structure feature layout (FEATURE_DIM slots, zero-padded).
# Every value is a whole number well inside float32's exact-int range,
# so the gate can hash them bit-for-bit against a SQL oracle:
#   PNG : [1, width, height, bit_depth, color_type, n_pixels,
#          min_px, max_px, sum_px, 0...]
#   WAV : [2, channels, sample_rate, bits, n_samples,
#          min_s, max_s, sum_s, sum_abs_s, 0...]
#   BMP : [3, width, height, bpp, n_pixels,
#          min_v, max_v, sum_v, 0...]   (v over ALL channel bytes)
#   AIFF: [4, channels, sample_rate, bits, n_samples,
#          min_s, max_s, sum_s, sum_abs_s, 0...]
KIND_IMAGE = 1.0
KIND_AUDIO = 2.0
KIND_IMAGE_BMP = 3.0
KIND_AUDIO_AIFF = 4.0


def decode_png_py(p: bytes) -> list[float]:
    """REAL PNG decode, stdlib only: chunk walk with CRC verification,
    IHDR parse, zlib inflate of the IDAT stream, scanline unfilter
    (filter types 0/1/2 — None/Sub/Up — cover what any encoder emits
    for the flat images this engine synthesizes; others raise).
    Supports 8-bit grayscale (color type 0). Raises ValueError on
    anything that is not a conforming PNG."""
    sig = b"\x89PNG\r\n\x1a\n"
    if not p or not p.startswith(sig):
        raise ValueError("not a PNG")
    pos = len(sig)
    ihdr = None
    idat = b""
    while pos + 8 <= len(p):
        (length,) = struct.unpack(">I", p[pos : pos + 4])
        ctype = p[pos + 4 : pos + 8]
        data = p[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(p):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", p[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError("bad chunk CRC")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">II5B", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or color_type != 0 or interlace != 0:
        raise ValueError("unsupported PNG variant (8-bit grayscale only)")
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError("scanline size mismatch")
    px: list[int] = []
    prev = [0] * w
    for y in range(h):
        row = raw[y * (w + 1) : (y + 1) * (w + 1)]
        ftype, line = row[0], list(row[1:])
        if ftype == 1:  # Sub
            for x in range(1, w):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            line = [(v + u) & 0xFF for v, u in zip(line, prev)]
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        px.extend(line)
        prev = line
    return [
        KIND_IMAGE, float(w), float(h), float(bit_depth), float(color_type),
        float(w * h), float(min(px)), float(max(px)), float(sum(px)),
    ] + [0.0] * (FEATURE_DIM - 9)


def decode_wav_py(p: bytes) -> list[float]:
    """REAL RIFF/WAV decode, stdlib only: RIFF header check, chunk walk
    to ``fmt `` and ``data``, PCM int16 sample parse. Raises ValueError
    on anything that is not a conforming PCM-16 WAV."""
    if not p or len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        (length,) = struct.unpack("<I", p[pos + 4 : pos + 8])
        data = p[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if length < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", data[:16])
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data before fmt")
            audio_format, channels, rate, _bps, _align, bits = fmt
            if audio_format != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (PCM-16 only)")
            samples = list(
                struct.unpack(f"<{length // 2}h", data[: (length // 2) * 2])
            )
        pos += 8 + length + (length & 1)  # RIFF chunks pad to even
    if fmt is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    _afmt, channels, rate, _bps, _align, bits = fmt
    return [
        KIND_AUDIO, float(channels), float(rate), float(bits),
        float(len(samples)), float(min(samples)), float(max(samples)),
        float(sum(samples)), float(sum(abs(s) for s in samples)),
    ] + [0.0] * (FEATURE_DIM - 9)


def decode_bmp_py(p: bytes) -> list[float]:
    """REAL BMP decode, stdlib only: BITMAPFILEHEADER + 40-byte
    BITMAPINFOHEADER parse, uncompressed 24-bpp (BI_RGB) bottom-up
    pixel array with 4-byte row padding honored. Feature stats run
    over ALL channel bytes (B, G, R per pixel). Raises ValueError on
    anything that is not a conforming 24-bpp bottom-up BMP — the same
    strict-subset discipline as the PNG/WAV decoders."""
    if not p or len(p) < 54 or p[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", p[10:14])
    (dib_size,) = struct.unpack("<I", p[14:18])
    if dib_size != 40:
        raise ValueError("unsupported DIB header (BITMAPINFOHEADER only)")
    w, h = struct.unpack("<ii", p[18:26])
    planes, bpp = struct.unpack("<HH", p[26:30])
    (compression,) = struct.unpack("<I", p[30:34])
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP variant (24-bpp BI_RGB only)")
    if w <= 0 or h <= 0:
        raise ValueError("unsupported BMP orientation (bottom-up only)")
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if offset + row_bytes * h > len(p):
        raise ValueError("truncated pixel array")
    vals: list[int] = []
    for y in range(h):
        row = p[offset + y * row_bytes : offset + y * row_bytes + w * 3]
        vals.extend(row)
    return [
        KIND_IMAGE_BMP, float(w), float(h), float(bpp),
        float(w * h), float(min(vals)), float(max(vals)), float(sum(vals)),
    ] + [0.0] * (FEATURE_DIM - 8)


def _ext80_encode(n: int) -> bytes:
    """IEEE 754 80-bit extended-precision encoding of a positive
    integer (the AIFF COMM sampleRate field — the one genuinely
    exotic parse in the format). Explicit leading-1 mantissa:
    exponent = 16383 + floor(log2 n), mantissa = n normalized to
    bit 63."""
    if n <= 0:
        raise ValueError("ext80 encoder handles positive integers only")
    e = n.bit_length() - 1
    mant = n << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def _ext80_to_int(b: bytes) -> int:
    """Decode an 80-bit extended float to an exact positive integer;
    raises on negatives, specials, and non-integral values (a
    conforming PCM AIFF has an integral sample rate)."""
    se, mant = struct.unpack(">HQ", b)
    if se & 0x8000:
        raise ValueError("negative sample rate")
    exp = se - 16383
    if exp < 0 or exp > 62 or not (mant >> 63):
        raise ValueError("non-integral or unnormalized sample rate")
    shift = 63 - exp
    if mant & ((1 << shift) - 1):
        raise ValueError("non-integral sample rate")
    return mant >> shift


def decode_aiff_py(p: bytes) -> list[float]:
    """REAL AIFF decode, stdlib only (the aifc module left the stdlib
    in Python 3.13 — this does not need it): IFF FORM walk to ``COMM``
    (big-endian fields + the 80-bit extended-float sample rate) and
    ``SSND`` (offset/blockSize header, then BIG-endian int16 samples —
    the endianness twin of the WAV decoder). Raises ValueError on
    anything that is not a conforming mono PCM-16 AIFF, same
    strict-subset discipline as the other three decoders."""
    if not p or len(p) < 12 or p[:4] != b"FORM" or p[8:12] != b"AIFF":
        raise ValueError("not an IFF/AIFF")
    pos = 12
    comm = None
    samples = None
    while pos + 8 <= len(p):
        cid = p[pos : pos + 4]
        (length,) = struct.unpack(">I", p[pos + 4 : pos + 8])
        data = p[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        if cid == b"COMM":
            if length < 18:
                raise ValueError("short COMM chunk")
            channels, nframes, bits = struct.unpack(">HIH", data[:8])
            rate = _ext80_to_int(data[8:18])
            comm = (channels, nframes, bits, rate)
        elif cid == b"SSND":
            if comm is None:
                raise ValueError("SSND before COMM")
            channels, nframes, bits, rate = comm
            if channels != 1 or bits != 16:
                raise ValueError("unsupported AIFF variant (mono PCM-16 only)")
            offset, block = struct.unpack(">II", data[:8])
            if offset != 0 or block != 0:
                raise ValueError("unsupported SSND block alignment")
            body = data[8 : 8 + nframes * 2]
            if len(body) != nframes * 2:
                raise ValueError("truncated sample data")
            samples = list(struct.unpack(f">{nframes}h", body))
        pos += 8 + length + (length & 1)  # IFF chunks pad to even
    if comm is None or samples is None:
        raise ValueError("missing COMM/SSND chunk")
    channels, _nframes, bits, rate = comm
    return [
        KIND_AUDIO_AIFF, float(channels), float(rate), float(bits),
        float(len(samples)), float(min(samples)), float(max(samples)),
        float(sum(samples)), float(sum(abs(s) for s in samples)),
    ] + [0.0] * (FEATURE_DIM - 9)


_DECODERS = {
    "image/png": decode_png_py,
    "audio/wav": decode_wav_py,
    "image/bmp": decode_bmp_py,
    "audio/aiff": decode_aiff_py,
}


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    strict: bool = False,
    normalize: bool = False,
) -> DataFrame:
    """Decode + feature-extract stage.

    PNG, PCM-WAV and 24-bpp BMP payloads take the REAL decode path
    (decode_png_py / decode_wav_py / decode_bmp_py above — pure
    stdlib, no codec libraries needed) and
    emit structure features from decoded pixels/samples. Every other
    container — and any payload that fails its parse — falls back to a
    deterministic 16-bin byte histogram (stable across runs, so tests
    can assert on it) when ``strict=False``; with ``strict=True`` the
    fallback raises instead (NotImplementedError for codecs this
    container lacks — JPEG/GIF/MP4 need PIL/ffmpeg — and ValueError
    for a malformed PNG/WAV), so a stubbed result can never be
    mistaken for a decoded one.

    With ``normalize=False`` (default) histogram features are the RAW
    bin counts (whole numbers, exactly representable in float32) so
    the correctness gate can hash them bit-for-bit against a SQL
    oracle; ``normalize=True`` emits the L1-normalized histogram a
    real featurizer shape would have (floats — not exactly comparable
    cross-engine, covered by pytest instead).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            mimes = []
            for p in pdf[payload_col]:
                mime = sniff_mime_py(p)
                mimes.append(mime)
                decoder = _DECODERS.get(mime)
                if decoder is not None:
                    try:
                        feats.append(decoder(p))
                        continue
                    except ValueError:
                        if strict:
                            raise
                if strict:
                    raise NotImplementedError(
                        f"no pure-python decoder for {mime} (needs codec "
                        "libraries not present in this container); plumbing "
                        "is real, this kernel is stubbed"
                    )
                # deterministic fallback: 16-bin byte histogram
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


def encode_png_py(width: int, height: int, pixel_fn) -> bytes:
    """Minimal REAL PNG encoder (8-bit grayscale, filter 0 scanlines,
    correct chunk CRCs, zlib-deflated IDAT): any conforming PNG reader
    decodes it. Used to synthesize decodable fixtures."""

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + bytes(pixel_fn(x, y) for x in range(width))
        for y in range(height)
    )
    ihdr = struct.pack(">II5B", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_bmp_py(width: int, height: int, pixel_fn) -> bytes:
    """Minimal REAL 24-bpp BMP encoder (BITMAPINFOHEADER, BI_RGB,
    bottom-up rows padded to 4 bytes): any conforming BMP reader
    decodes it. ``pixel_fn(x, y)`` returns the (b, g, r) byte triple.
    Used to synthesize decodable fixtures."""
    row_bytes = (width * 3 + 3) & ~3
    pix = b"".join(
        b"".join(bytes(pixel_fn(x, y)) for x in range(width))
        + b"\x00" * (row_bytes - width * 3)
        for y in range(height)
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40)
    return header + dib + pix


def encode_aiff_py(samples: list[int], rate: int = 8000) -> bytes:
    """Minimal REAL mono PCM-16 AIFF encoder (conforming FORM layout,
    big-endian samples, 80-bit extended sample rate)."""
    body = struct.pack(f">{len(samples)}h", *samples)
    comm = struct.pack(">HIH", 1, len(samples), 16) + _ext80_encode(rate)
    ssnd = struct.pack(">II", 0, 0) + body
    chunks = (
        b"COMM" + struct.pack(">I", len(comm)) + comm + (b"\x00" * (len(comm) & 1))
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd + (b"\x00" * (len(ssnd) & 1))
    )
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


def encode_wav_py(samples: list[int], rate: int = 8000) -> bytes:
    """Minimal REAL PCM-16 mono WAV encoder (conforming RIFF layout)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# closed-form synthesis parameters (the oracle recomputes features from
# these, so they are part of the fixture contract)
PNG_W = lambda d: 4 + d % 13  # noqa: E731
PNG_H = lambda d: 3 + d % 7  # noqa: E731
PNG_PX = lambda d, x, y: (d + 31 * x + 17 * y) % 256  # noqa: E731
WAV_N = lambda d: 32 + d % 64  # noqa: E731
WAV_S = lambda d, i: ((d * 7 + i * 13) % 2048) - 1024  # noqa: E731
BMP_W = lambda d: 2 + d % 9  # noqa: E731 — spans all 4-byte pad phases
BMP_H = lambda d: 2 + d % 5  # noqa: E731
# channel c in (0=B, 1=G, 2=R): distinct per-channel values so a
# swapped/ignored channel cannot cancel out in the summed features
BMP_PX = lambda d, x, y, c: ((d + 13 * x + 7 * y) * (c + 1)) % 256  # noqa: E731
AIFF_N = lambda d: 16 + d % 48  # noqa: E731
AIFF_S = lambda d, i: ((d * 11 + i * 17) % 4096) - 2048  # noqa: E731
AIFF_RATE = lambda d: 8000 + 1000 * (d % 5)  # noqa: E731 — exercises ext80


def attach_decodable_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media payloads for the decode path: ids
    rotate by ``doc_id % 4`` through a conforming 8-bit grayscale PNG,
    a PCM-16 WAV, a 24-bpp BMP and a mono PCM-16 AIFF — sizes, pixels,
    samples and rates all closed-form in doc_id, so a SQL oracle can
    recompute the decoded features without any decoder of its own."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                if d % 4 == 0:
                    w, h = PNG_W(d), PNG_H(d)
                    payloads.append(
                        encode_png_py(w, h, lambda x, y, d=d: PNG_PX(d, x, y))
                    )
                elif d % 4 == 1:
                    payloads.append(
                        encode_wav_py([WAV_S(d, i) for i in range(WAV_N(d))])
                    )
                elif d % 4 == 2:
                    payloads.append(
                        encode_bmp_py(
                            BMP_W(d),
                            BMP_H(d),
                            lambda x, y, d=d: tuple(
                                BMP_PX(d, x, y, c) for c in range(3)
                            ),
                        )
                    )
                else:
                    payloads.append(
                        encode_aiff_py(
                            [AIFF_S(d, i) for i in range(AIFF_N(d))],
                            rate=AIFF_RATE(d),
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(op, "doc_id long, payload binary")


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
