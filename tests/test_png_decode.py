"""Pure-stdlib PNG decode (ops/multimodal.py decode_png — zlib + struct,
no codec library): round-trip against a test-side encoder that writes
every scanline-filter type and color type, plus the Spark mapInPandas
pipeline (png_pixel_stats / codec='png' / codec='auto') over generated
PNG payloads."""

from __future__ import annotations

import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.ops.multimodal import (  # noqa: E402
    decode_binary_features, decode_png, png_pixel_stats)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png(px: np.ndarray, ctype: int, filters=None,
               plte: np.ndarray | None = None) -> bytes:
    """Minimal test-side PNG encoder: 8-bit, non-interlaced, one filter
    type per scanline (``filters[y]``, default 0). Encoding row y with
    filter f stores ``x - pred`` exactly per the spec, so the decoder's
    un-filter paths are exercised bit-for-bit."""
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    h, stride = px.shape
    w = stride // nch
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        line = px[y].astype(np.int32)
        enc = line.copy()
        for i in range(stride):
            a = int(line[i - nch]) if i >= nch else 0
            b = int(prev[i])
            c = int(prev[i - nch]) if i >= nch else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            else:
                pred = 0
            enc[i] = (int(line[i]) - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + _chunk(b"IEND", b"")


def _rand_px(rng, h, w, nch):
    return rng.randint(0, 256, size=(h, w * nch)).astype(np.uint8)


@pytest.mark.parametrize("ctype,nch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_roundtrip_all_filters(ctype, nch):
    rng = np.random.RandomState(3 + ctype)
    px = _rand_px(rng, 10, 7, nch)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]   # every filter type
    payload = encode_png(px, ctype, filters=filters)
    w, h, ch, got = decode_png(payload)
    assert (w, h, ch) == (7, 10, nch)
    assert np.array_equal(got, px)


def test_palette_expands_to_rgb():
    rng = np.random.RandomState(11)
    plte = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, size=(5, 6)).astype(np.uint8)
    payload = encode_png(idx, 3, filters=[0, 1, 2, 3, 4], plte=plte)
    w, h, ch, got = decode_png(payload)
    assert (w, h, ch) == (6, 5, 3)
    assert np.array_equal(got.reshape(5, 6, 3), plte[idx])


def test_unsupported_profiles_raise():
    rng = np.random.RandomState(5)
    px = _rand_px(rng, 4, 4, 3)
    good = encode_png(px, 2)
    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG" + good)
    # 16-bit depth: patch IHDR's depth byte and re-CRC
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = (good[:8] + _chunk(b"IHDR", ihdr) + good[8 + 12 + 13:])
    with pytest.raises(ValueError):
        decode_png(bad)


def test_truncated_ihdr_raises_valueerror():
    """The documented contract is ValueError for anything out of scope —
    a chunk header declaring 13 IHDR bytes with fewer payload bytes
    remaining must not leak struct.error to the caller."""
    sig = b"\x89PNG\r\n\x1a\n"
    truncated = sig + struct.pack(">I4s", 13, b"IHDR") + b"\x00\x00\x00\x01"
    with pytest.raises(ValueError, match="truncated IHDR"):
        decode_png(truncated)


def test_spark_pipeline_decodes_real_pixels(spark):
    """The full mapInPandas path: generated PNGs (mixed color types and
    filters) -> png_pixel_stats matches numpy-computed means; a corrupt
    payload yields NULLs, never a stage failure."""
    rng = np.random.RandomState(7)
    payloads, expected = [], {}
    for i, (ctype, nch) in enumerate([(0, 1), (2, 3), (6, 4), (2, 3)]):
        px = _rand_px(rng, 8, 9, nch)
        payloads.append((i, bytearray(encode_png(
            px, ctype, filters=[i % 5] * 8))))
        m = px.reshape(8 * 9, nch).mean(axis=0)
        rgb = (m[0],) * 3 if nch in (1, 2) else tuple(m[:3])
        expected[i] = (9, 8, nch, *(round(float(v), 4) for v in rgb))
    payloads.append((99, bytearray(b"\x89PNG\r\n\x1a\ngarbage")))
    df = spark.createDataFrame(payloads, "doc_id LONG, payload BINARY")
    got = {r["doc_id"]: (r["width"], r["height"], r["channels"],
                         r["mean_r"], r["mean_g"], r["mean_b"])
           for r in png_pixel_stats(df).collect()}
    for i, exp in expected.items():
        assert got[i] == exp, (i, got[i], exp)
    assert got[99] == (None,) * 6


def test_codec_auto_uses_real_png_decode(spark):
    """codec='auto' without Pillow: PNG payloads get REAL dimensions
    (not the md5 fake), non-PNG payloads keep the deterministic stub.
    In a Pillow-equipped environment auto resolves to Pillow instead
    (pinned by tests/test_ops.py::test_binary_decode_codec_paths), so
    the stub-fallback assertions here only apply without it."""
    from maha_spark.ops import multimodal as mm
    if mm.HAS_CODEC:
        pytest.skip("Pillow present: auto resolves to the PIL path")
    from maha_spark.ops.multimodal import _fake_decode
    rng = np.random.RandomState(9)
    png = encode_png(_rand_px(rng, 3, 5, 3), 2)
    txt = b"just some text payload"
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(txt))],
        "doc_id LONG, payload BINARY")
    got = {r["doc_id"]: (r["width"], r["height"], r["format"])
           for r in decode_binary_features(df, codec="auto").collect()}
    assert got[1] == (5, 3, "image/png")
    fw, fh, ff = _fake_decode(txt)
    assert got[2] == (fw, fh, ff)
    # codec='png' forces the stdlib decoder: text is undecodable
    got2 = {r["doc_id"]: r["format"]
            for r in decode_binary_features(df, codec="png").collect()}
    assert got2 == {1: "image/png", 2: "undecodable"}


def test_degenerate_dimensions_rejected():
    """A crafted IHDR with zero height / absurd width must raise in
    decode_png (an Int32-overflowing 'success' would fail the whole
    Spark batch), and must surface as NULLs — not a stage failure —
    through the pipeline."""
    ihdr = struct.pack(">IIBBBBB", 2**31 - 1, 0, 8, 0, 0, 0, 0)
    crafted = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b""))
               + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(crafted)


def test_decompression_bomb_rejected():
    """A few-KB IDAT inflating far past the declared pixel buffer must
    be rejected by the bounded inflate, not fully decompressed."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (50 * 1024 * 1024), 9)  # ~50 MB -> KBs
    crafted = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
    import time
    t0 = time.time()
    with pytest.raises(ValueError):
        decode_png(crafted)
    assert time.time() - t0 < 1.0  # rejected without inflating 50 MB


def test_crafted_payloads_yield_nulls_in_pipeline(spark):
    """End-to-end contract: crafted/corrupt payloads become NULL rows,
    never a stage failure."""
    ihdr = struct.pack(">IIBBBBB", 2**31 - 1, 0, 8, 0, 0, 0, 0)
    crafted = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b""))
               + _chunk(b"IEND", b""))
    rng = np.random.RandomState(21)
    ok = encode_png(_rand_px(rng, 2, 2, 3), 2)
    df = spark.createDataFrame(
        [(1, bytearray(crafted)), (2, bytearray(ok))],
        "doc_id LONG, payload BINARY")
    got = {r["doc_id"]: (r["width"], r["channels"])
           for r in png_pixel_stats(df).collect()}
    assert got[1] == (None, None)
    assert got[2] == (2, 3)


# ------------------------------------------------------------- WAV audio
def _make_wav(sr=8000, nch=1, sw=2, seconds=0.25, freq=440.0, amp=0.5):
    """Test-side PCM WAV writer (stdlib wave): a pure sine at ``freq``
    with amplitude ``amp`` — RMS is amp/sqrt(2) analytically."""
    import io
    import wave

    n = int(sr * seconds)
    t = np.arange(n) / sr
    x = amp * np.sin(2 * np.pi * freq * t)
    if sw == 2:
        pcm = (x * 32767).astype("<i2")
    elif sw == 1:
        pcm = ((x * 127) + 128).astype(np.uint8)
    else:
        pcm = (x * (2**31 - 1)).astype("<i4")
    data = np.repeat(pcm[:, None], nch, axis=1).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sw)
        w.setframerate(sr)
        w.writeframes(data)
    return buf.getvalue(), n


@pytest.mark.parametrize("sw,nch", [(1, 1), (2, 1), (2, 2), (4, 2)])
def test_wav_roundtrip_rms(sw, nch):
    from maha_spark.ops.multimodal import decode_wav
    payload, n = _make_wav(sw=sw, nch=nch, amp=0.5)
    sr, ch, nf, x = decode_wav(payload)
    assert (sr, ch, nf) == (8000, nch, n)
    rms = float(np.sqrt((x * x).mean()))
    # analytic sine RMS = amp/sqrt(2); quantization bounds the error
    tol = 0.02 if sw == 1 else 0.001
    assert abs(rms - 0.5 / np.sqrt(2)) < tol, rms


def test_wav_spark_pipeline(spark):
    from maha_spark.ops.multimodal import wav_audio_stats
    good, n = _make_wav(sr=16000, nch=2, sw=2, seconds=0.125)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"RIFFgarbage")),
         (3, bytearray(b""))],
        "doc_id LONG, payload BINARY")
    got = {r["doc_id"]: (r["sample_rate"], r["channels"], r["n_frames"],
                         r["duration_s"]) for r in
           wav_audio_stats(df).collect()}
    assert got[1] == (16000, 2, n, round(n / 16000, 6))
    assert got[2] == (None, None, None, None)
    assert got[3] == (None, None, None, None)


def test_encode_png_roundtrip_and_filter_coverage():
    """The in-repo encoder (the mm_pixel_stats test-vector generator) is
    a genuinely independent forward implementation: its output decodes
    bit-exactly through decode_png, and its scanline filter bytes cycle
    through ALL five spec filters (so the contract entry exercises every
    un-predictor every round)."""
    import zlib

    from maha_spark.ops.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for nch in (1, 3):
        px = rng.integers(0, 256, size=(7, 9 * nch), dtype=np.uint8)
        payload = encode_png(px, nch)
        w, h, n2, dec = decode_png(payload)
        assert (w, h, n2) == (9, 7, nch)
        assert (dec == px).all()
        # filter byte of scanline y is y % 5 in the raw stream
        idat = payload[payload.index(b"IDAT") + 4:payload.rindex(b"IEND") - 8]
        raw = zlib.decompress(idat)
        stride = 9 * nch
        assert [raw[y * (stride + 1)] for y in range(7)] == \
            [y % 5 for y in range(7)]


def test_encode_png_rejects_bad_shapes():
    from maha_spark.ops.multimodal import encode_png
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 4), dtype=np.uint8), 5)
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 4), dtype=np.uint8), 3)
