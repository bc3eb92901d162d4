"""Multimodal binary-column plumbing (decode kernel stubbed)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators import multimodal as M


def _payloads(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\nrest"),
        (1, b"\xff\xd8\xff\xe0jpegdata"),
        (2, b"RIFFxxxxWAVE"),
        (3, b"plain bytes"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_probe_media(spark):
    out = {r.doc_id: r for r in M.probe_media(_payloads(spark)).collect()}
    assert out[0].mime == "image/png"
    assert out[1].mime == "image/jpeg"
    assert out[2].mime == "audio/wav"
    assert out[3].mime == "application/octet-stream"
    assert out[4].mime == "application/octet-stream" and out[4].n_bytes == 0
    assert out[0].sha1 == hashlib.sha1(b"\x89PNG\r\n\x1a\nrest").hexdigest()


def test_decode_features_stub_deterministic(spark):
    a = M.decode_features(_payloads(spark)).collect()
    b = M.decode_features(_payloads(spark)).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    row0 = next(r for r in a if r.doc_id == 0)
    assert len(row0.features) == M.FEATURE_DIM
    # default mode: raw bin counts, sum == payload length (first 4 KB)
    assert sum(row0.features) == len(b"\x89PNG\r\n\x1a\nrest")
    norm0 = next(
        r
        for r in M.decode_features(_payloads(spark), normalize=True).collect()
        if r.doc_id == 0
    )
    assert abs(sum(norm0.features) - 1.0) < 1e-3


def test_features_digest_scalar(spark):
    out = M.features_digest(M.decode_features(_payloads(spark))).collect()
    row0 = next(r for r in out if r.doc_id == 0)
    assert row0.n_features == M.FEATURE_DIM
    assert len(row0.features_md5) == 32


def test_probe_hex_md5(spark):
    out = {r.doc_id: r for r in M.probe_media(_payloads(spark)).collect()}
    payload = b"\x89PNG\r\n\x1a\nrest"
    assert out[0].hex_md5 == hashlib.md5(payload.hex().upper().encode()).hexdigest()
    assert out[4].hex_md5 is None


def test_decode_features_strict_raises(spark):
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        M.decode_features(_payloads(spark), strict=True).collect()


def test_attach_fake_payload(spark):
    docs = spark.createDataFrame([(0, "hello"), (1, "x"), (2, "y")], "doc_id long, text string")
    probed = M.probe_media(M.attach_fake_payload(docs)).collect()
    mimes = {r.doc_id: r.mime for r in probed}
    assert mimes == {0: "image/png", 1: "image/jpeg", 2: "audio/wav"}


def test_sample_frames_fanout_and_digests(spark):
    import hashlib

    from go_crawler_20251102_011312_url_crawlerv10_twotier_spark.operators.multimodal import (
        sample_frames,
    )

    p = bytes(range(256)) * 5 + b"tail"  # 1284 bytes -> 6 frames, sample 0 and 4
    df = spark.createDataFrame([(1, p), (2, b"ab")], "doc_id long, payload binary")
    rows = sorted(
        ((r.doc_id, r.frame_idx, r.n_frames, r.frame_md5) for r in sample_frames(df).collect())
    )
    def dig(chunk):
        return hashlib.md5(chunk.hex().upper().encode()).hexdigest()
    assert rows == [
        (1, 0, 6, dig(p[0:256])),
        (1, 4, 6, dig(p[1024:1280])),
        (2, 0, 1, dig(b"ab")),
    ]
