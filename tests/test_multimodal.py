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


def test_png_roundtrip_pure_python():
    """encode_png_py output is a conforming PNG and decode_png_py
    recovers the exact pixel statistics."""
    w, h = 5, 3
    px = lambda x, y: (7 + 31 * x + 17 * y) % 256  # noqa: E731
    p = M.encode_png_py(w, h, px)
    feats = M.decode_png_py(p)
    vals = [px(x, y) for y in range(h) for x in range(w)]
    assert feats[:9] == [
        M.KIND_IMAGE, 5.0, 3.0, 8.0, 0.0, 15.0,
        float(min(vals)), float(max(vals)), float(sum(vals)),
    ]
    # corrupt one payload byte inside IDAT -> CRC check must catch it
    bad = bytearray(p)
    bad[len(p) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        M.decode_png_py(bytes(bad))


def test_png_decoder_unfilters_sub_and_up():
    """decode_png_py handles Sub/Up filtered scanlines (an external
    encoder may emit them even though ours writes filter 0)."""
    import struct as st
    import zlib

    # image: 3x2, row0 = [10, 13, 16] Sub-filtered, row1 = row0+1 Up-filtered
    raw = b"\x01" + bytes([10, 3, 3]) + b"\x02" + bytes([1, 1, 1])
    def chunk(ctype, data):
        return (
            st.pack(">I", len(data)) + ctype + data
            + st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">II5B", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    feats = M.decode_png_py(p)
    # pixels: [10,13,16] and [11,14,17]
    assert feats[5:9] == [6.0, 10.0, 17.0, float(10 + 13 + 16 + 11 + 14 + 17)]


def test_wav_roundtrip_pure_python():
    samples = [((7 * 3 + i * 13) % 2048) - 1024 for i in range(40)]
    p = M.encode_wav_py(samples, rate=8000)
    feats = M.decode_wav_py(p)
    assert feats[:9] == [
        M.KIND_AUDIO, 1.0, 8000.0, 16.0, 40.0,
        float(min(samples)), float(max(samples)),
        float(sum(samples)), float(sum(abs(s) for s in samples)),
    ]
    with pytest.raises(ValueError):
        M.decode_wav_py(b"RIFF1234WAVEgarbage")


def test_bmp_roundtrip_pure_python():
    """24-bpp BMP encode -> decode round trip, on a width whose row
    needs 4-byte padding (w=2: 6 pixel bytes + 2 pad) — the pad bytes
    must NOT leak into the stats."""
    vals = {}
    def px(x, y):
        t = tuple(((5 + 13 * x + 7 * y) * (c + 1)) % 256 for c in range(3))
        vals[(x, y)] = t
        return t
    p = M.encode_bmp_py(2, 3, px)
    feats = M.decode_bmp_py(p)
    flat = [v for t in vals.values() for v in t]
    assert feats[:8] == [
        M.KIND_IMAGE_BMP, 2.0, 3.0, 24.0, 6.0,
        float(min(flat)), float(max(flat)), float(sum(flat)),
    ]
    with pytest.raises(ValueError):
        M.decode_bmp_py(b"BMgarbage-too-short")
    with pytest.raises(ValueError):
        # 8-bpp variant rejected (strict subset)
        import struct as _st
        bad = bytearray(p)
        bad[28:30] = _st.pack("<H", 8)
        M.decode_bmp_py(bytes(bad))


def test_decode_features_real_path_strict(spark):
    """Real PNG/WAV/BMP payloads decode under strict=True (no
    fallback), and the decoded structure features land in the
    DataFrame."""
    docs = spark.createDataFrame([(0,), (1,), (2,), (3,)], "doc_id long")
    payloads = M.attach_decodable_payload(docs)
    out = {r.doc_id: r for r in
           M.decode_features(payloads, strict=True).collect()}
    assert out[0].mime == "image/png"
    assert out[0].features[0] == M.KIND_IMAGE
    assert out[0].features[1] == float(M.PNG_W(0))  # width
    assert out[1].mime == "audio/wav"
    assert out[1].features[4] == float(M.WAV_N(1))  # n_samples
    assert out[2].mime == "image/bmp"
    assert out[2].features[0] == M.KIND_IMAGE_BMP
    assert out[2].features[1:5] == [
        float(M.BMP_W(2)), float(M.BMP_H(2)), 24.0,
        float(M.BMP_W(2) * M.BMP_H(2)),
    ]
    # fake (unparseable) PNG still falls back non-strict, raises strict
    fake = spark.createDataFrame([(9, b"\x89PNG\r\n\x1a\nnot-a-png")],
                                 "doc_id long, payload binary")
    assert M.decode_features(fake).collect()[0].features  # histogram path
    with pytest.raises(Exception):
        M.decode_features(fake, strict=True).collect()


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


def test_aiff_roundtrip_pure_python():
    """Mono PCM-16 AIFF encode -> decode round trip: big-endian
    samples (the endianness twin of WAV) and the 80-bit extended
    sample rate parsed back exactly."""
    samples = [((9 * 11 + i * 17) % 4096) - 2048 for i in range(24)]
    p = M.encode_aiff_py(samples, rate=11025)
    feats = M.decode_aiff_py(p)
    assert feats[:9] == [
        M.KIND_AUDIO_AIFF, 1.0, 11025.0, 16.0, 24.0,
        float(min(samples)), float(max(samples)),
        float(sum(samples)), float(sum(abs(s) for s in samples)),
    ]
    with pytest.raises(ValueError):
        M.decode_aiff_py(b"FORM1234AIFFgarbage")
    with pytest.raises(ValueError):
        M.decode_aiff_py(M.encode_wav_py(samples))  # wrong container


def test_ext80_exact_roundtrip():
    """The 80-bit extended float: every common audio rate (and the
    degenerate 1 Hz) survives encode -> decode bit-exactly; truncated
    mantissas and negatives are rejected."""
    import struct as _st

    for rate in (1, 8000, 11025, 22050, 44100, 48000, 96000, 192000):
        assert M._ext80_to_int(M._ext80_encode(rate)) == rate
    with pytest.raises(ValueError):
        M._ext80_encode(0)
    with pytest.raises(ValueError):
        M._ext80_to_int(_st.pack(">HQ", 0x8000 | 16395, 1 << 63))  # negative
    with pytest.raises(ValueError):
        M._ext80_to_int(_st.pack(">HQ", 16383, (1 << 63) | 1))  # non-integral


def test_aiff_strict_variants_rejected():
    samples = [0, 100, -100]
    p = bytearray(M.encode_aiff_py(samples))
    import struct as _st

    # stereo COMM rejected (mono-only strict subset)
    p2 = bytearray(p)
    p2[20:22] = _st.pack(">H", 2)
    with pytest.raises(ValueError):
        M.decode_aiff_py(bytes(p2))
    # truncated SSND body rejected
    with pytest.raises(ValueError):
        M.decode_aiff_py(bytes(p[:-2]))
