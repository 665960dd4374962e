"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

Decode tiers, worker-probed per task:

* ``codec="pil"``/Pillow present — full-format real decode;
* ``decode_png`` — a REAL pure-stdlib PNG decoder (zlib inflate + all
  five scanline filters; no codec library at all), used by
  ``codec="png"`` and, for PNG payloads, by ``codec="auto"`` — so even
  this codec-less container decodes real pixels end-to-end
  (``png_pixel_stats`` computes per-channel means over them);
  ``decode_wav`` / ``wav_audio_stats`` are the audio twin (stdlib
  ``wave`` PCM: sample rate, duration, RMS);
* the deterministic md5 stub (``codec="stub"``) for non-PNG payloads
  without Pillow — the oracle-checked driver-contract path, kept
  because the testdata corpus has no real image column.

The Spark-side plumbing is identical in every tier: binary column
construction, explicit output schema, Arrow batch transfer, and a
partition-preserving mapInPandas pipeline. The driver-facing query
(``mm_decode_features``) pins the stub codec so its DuckDB oracle (pure
md5 arithmetic) stays valid in any environment.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

from .common import load_table

DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("content_md5", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("format", StringType()),
])


def _probe_codec():
    """Import-probe for an optional real image codec (Pillow). The sandbox
    ships none, so decode falls back to the deterministic stub; an
    environment WITH Pillow gets real decoding through the identical
    mapInPandas schema/batch shape with zero code changes."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


HAS_CODEC = _probe_codec() is not None


def _fake_dims(digest: str) -> tuple[int, int, str]:
    """Dimensions of the decode STUB from an already-computed md5 hex
    digest (one md5 per payload — the batch loop also needs the digest
    for ``content_md5``, so it is computed once and shared)."""
    return (1 + int(digest[:4], 16) % 1024,
            1 + int(digest[4:8], 16) % 1024, "fake/rgb8")


def _fake_decode(payload: bytes) -> tuple[int | None, int | None, str]:
    """STUB — deterministic stand-in for an image decoder.

    Production would decode real pixels (see ``_make_pil_decode``); here the
    'decoded' dimensions derive from the payload digest so the pipeline is
    testable without codecs.
    """
    return _fake_dims(hashlib.md5(payload).hexdigest())


def decode_png(payload: bytes) -> tuple[int, int, int, "object"]:
    """REAL pure-stdlib PNG decoder (zlib + struct — no codec library):
    returns ``(width, height, channels, pixels)`` with ``pixels`` a
    ``(height, width*channels)`` uint8 numpy array.

    Scope: the baseline PNG profile — 8-bit depth, color types
    gray(0)/RGB(2)/palette(3)/gray+alpha(4)/RGBA(6), non-interlaced,
    all five scanline filters (None/Sub/Up/Average/Paeth). Anything
    outside raises ValueError (callers map that to 'undecodable').
    Sub/Up un-filtering is numpy-vectorized; Average/Paeth keep the
    spec's sequential left-dependency — this is the zero-dependency
    CORRECTNESS decoder (and the swap-in point stays ``codec='pil'``
    for a SIMD library when the environment ships one).
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, idat, hdr, plte = 8, [], None, None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        pos += 8
        data = payload[pos:pos + ln]
        pos += ln + 4                        # skip CRC
        if typ == b"IHDR":
            # a truncated chunk (IHDR declaring length 13 with fewer
            # payload bytes remaining) must honor the documented
            # "anything out of scope raises ValueError" contract, not
            # leak struct.error to the caller
            try:
                hdr = struct.unpack(">IIBBBBB", data)
            except struct.error as e:
                raise ValueError(f"truncated IHDR chunk: {e}") from e
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = hdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if depth != 8 or nch is None or comp != 0 or filt != 0 or interlace:
        raise ValueError("unsupported PNG profile")
    # dimension sanity: zero/degenerate dims must not decode
    # "successfully" (a w=2^31 h=0 IHDR would otherwise survive to the
    # Int32 batch column and fail the whole stage), and the pixel
    # buffer must be bounded BEFORE inflation
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20
            and w * h * nch <= 1 << 30):
        raise ValueError("implausible PNG dimensions")
    stride = w * nch
    expect = h * (stride + 1)
    # bounded inflate: a corrupt/crafted IDAT must not decompression-
    # bomb the worker — inflate at most expect+1 bytes and reject any
    # over/under-length stream
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expect + 1)
    if len(raw) != expect or d.unconsumed_tail or d.flush(1):
        raise ValueError("wrong-length scanline stream")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)],
            dtype=np.uint8).astype(np.int32)
        if f == 1:      # Sub: per-channel-lane prefix sum (mod 256)
            line = line.reshape(w, nch).cumsum(axis=0).reshape(stride)
        elif f == 2:    # Up
            line = line + prev
        elif f == 3:    # Average: left term is sequential by spec
            line = line.copy()
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] += (int(left) + int(prev[i])) // 2
                line[i] &= 0xFF
        elif f == 4:    # Paeth: sequential predictor
            line = line.copy()
            for i in range(stride):
                a = int(line[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter {f}")
        line = line & 0xFF
        out[y] = line.astype(np.uint8)
        prev = line
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        out = plte[out.reshape(h * w)].reshape(h, w * 3)
        nch = 3
    return w, h, nch, out


def _stdlib_decode(payload: bytes) -> tuple[int | None, int | None, str]:
    """Codec-chain step backed by ``decode_png``: real dimensions for
    baseline PNGs, 'undecodable' for everything else."""
    try:
        w, h, _nch, _px = decode_png(payload)
        return w, h, "image/png"
    except Exception:
        return None, None, "undecodable"


def _make_pil_decode(Image):
    """Bind a decode-one over an already-resolved Pillow Image module (the
    probe runs once per task, not once per payload). Undecodable payloads
    yield NULL dimensions, never an exception — one corrupt object in a
    100 TB corpus must not fail the stage."""
    import io

    def decode_one(payload: bytes) -> tuple[int | None, int | None, str]:
        try:
            with Image.open(io.BytesIO(payload)) as img:
                return (int(img.width), int(img.height),
                        f"image/{(img.format or 'unknown').lower()}")
        except Exception:
            return None, None, "undecodable"
    return decode_one


def decode_binary_features(binary_df: DataFrame,
                           codec: str = "auto") -> DataFrame:
    """(id, payload binary) -> typed features via Arrow-batched pandas.

    ``codec``: ``"auto"`` uses Pillow when importable, else the REAL
    stdlib PNG decoder for PNG payloads with the stub for the rest;
    ``"stub"`` forces the deterministic fake (the oracle-checked path);
    ``"pil"`` requires Pillow; ``"png"`` forces the stdlib PNG decoder
    (non-PNG payloads come back 'undecodable').

    Scale notes: mapInPandas streams Arrow batches — no driver collect, no
    per-row Python calls; partitioning of the input is preserved, so at
    100 TB this runs one Python worker per core over ~10k-row batches.
    """
    if codec not in ("auto", "stub", "pil", "png"):
        raise ValueError(f"unknown codec mode {codec!r}")
    # deliberately NO driver-side Pillow precheck for codec='pil': driver
    # and executors can have different installs, and a cluster with Pillow
    # on executors but not the driver should still decode — the worker-side
    # probe below raises ImportError per task if Pillow is truly missing

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the probe runs HERE, on the worker, once per task: driver and
        # executors can have different installs, and a driver-side
        # decision would make a worker without Pillow mark every payload
        # 'undecodable' instead of falling back to the stub (auto) or
        # failing loudly (pil)
        Image = _probe_codec() if codec in ("auto", "pil") else None
        if codec == "pil" and Image is None:
            raise ImportError("codec='pil': Pillow missing on the worker")
        if Image is not None:
            decode_one, use_real = _make_pil_decode(Image), True
        elif codec == "png":
            decode_one, use_real = _stdlib_decode, True
        elif codec == "auto":
            # no Pillow: REAL stdlib decode for PNG signatures, the
            # deterministic stub for everything else
            def decode_one(p: bytes):
                if p[:8] == b"\x89PNG\r\n\x1a\n":
                    return _stdlib_decode(p)
                return _fake_decode(p)
            use_real = True
        else:
            decode_one, use_real = _fake_decode, False
        # real decode can yield NULL dims (undecodable payloads) -> the
        # nullable Int32 extension dtype; the stub never does
        dim_dtype = "Int32" if use_real else "int32"
        for pdf in batches:
            # ONE md5 per payload: content_md5 and the stub dims share
            # the digest (the stub used to re-hash every payload a
            # second time — guide §4.2, per-task work)
            digests = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
            if use_real:
                decoded = [decode_one(p) for p in pdf["payload"]]
            else:
                decoded = [_fake_dims(h) for h in digests]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "content_md5": digests,
                "width": pd.Series([d[0] for d in decoded], dtype=dim_dtype),
                "height": pd.Series([d[1] for d in decoded],
                                    dtype=dim_dtype),
                "format": [d[2] for d in decoded],
            })

    return binary_df.mapInPandas(decode, schema=DECODE_SCHEMA)


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque binary payload and
    run the decode pipeline over it. Pinned to the STUB codec: the
    payloads are text (not decodable images) and the DuckDB oracle is the
    stub's md5 arithmetic — this entry stays deterministic even in an
    environment where the Pillow probe succeeds."""
    docs = load_table(spark, sf_dir, "documents")
    binary = docs.selectExpr("doc_id",
                             "CAST(encode(text, 'utf-8') AS BINARY) AS payload")
    return decode_binary_features(binary, codec="stub")


PIXEL_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("mean_r", DoubleType()),   # rounded to 4 dp
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
])


def png_pixel_stats(binary_df: DataFrame) -> DataFrame:
    """REAL pixel feature extraction with zero codec dependencies:
    decode each PNG payload with ``decode_png`` and emit per-channel
    means (gray expands to r=g=b; alpha is dropped). Undecodable
    payloads yield NULL dims/means — one corrupt object must not fail
    the stage. Same 100 TB shape as the other mapInPandas ops: Arrow
    batches, no driver collect, partitioning preserved."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, nch, px = decode_png(bytes(payload))
                    m = px.reshape(h * w, nch).mean(axis=0,
                                                    dtype=np.float64)
                    rgb = (m[0], m[0], m[0]) if nch in (1, 2) \
                        else (m[0], m[1], m[2])
                    rows.append((int(doc_id), w, h, nch,
                                 *(round(float(v), 4) for v in rgb)))
                except Exception:
                    rows.append((int(doc_id), None, None, None,
                                 None, None, None))
            yield pd.DataFrame({
                "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "width": pd.Series([r[1] for r in rows], dtype="Int32"),
                "height": pd.Series([r[2] for r in rows], dtype="Int32"),
                "channels": pd.Series([r[3] for r in rows],
                                      dtype="Int32"),
                "mean_r": pd.Series([r[4] for r in rows],
                                    dtype="float64"),
                "mean_g": pd.Series([r[5] for r in rows],
                                    dtype="float64"),
                "mean_b": pd.Series([r[6] for r in rows],
                                    dtype="float64"),
            })

    return binary_df.mapInPandas(stats, schema=PIXEL_SCHEMA)


def encode_png(pixels: "object", channels: int) -> bytes:
    """Pure-stdlib baseline-PNG ENCODER (zlib + struct): ``pixels`` is a
    ``(height, width*channels)`` uint8 array, ``channels`` 1 (gray) or
    3 (RGB). Each scanline ``y`` is forward-filtered with filter type
    ``y % 5``, cycling through all five spec filters
    (None/Sub/Up/Average/Paeth) — so a decode of the output exercises
    every un-predictor, which is exactly why this exists: it generates
    deterministic test vectors for ``decode_png`` (the write path of
    the multimodal column plumbing, and the driver-contract oracle
    input for ``mm_pixel_stats``). Forward filters are written
    independently from the decoder's un-filters, straight from the
    spec's filter definitions (RFC 2083 §6), so an encode->decode
    round-trip checks two separate implementations against each other.
    """
    import struct
    import zlib

    import numpy as np

    ctype = {1: 0, 3: 2}.get(channels)
    if ctype is None:
        raise ValueError(f"unsupported channel count {channels}")
    px = np.asarray(pixels, dtype=np.uint8)
    h, stride = px.shape
    if stride % channels:
        raise ValueError("row stride is not a multiple of channels")
    w = stride // channels

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = px[y].astype(np.int32)
        f = y % 5
        if f == 0:
            filt = line
        elif f == 1:    # Sub: subtract the pixel to the left (same lane)
            left = np.concatenate([np.zeros(channels, dtype=np.int32),
                                   line[:-channels]])
            filt = line - left
        elif f == 2:    # Up
            filt = line - prev
        elif f == 3:    # Average
            left = np.concatenate([np.zeros(channels, dtype=np.int32),
                                   line[:-channels]])
            filt = line - (left + prev) // 2
        else:           # Paeth
            left = np.concatenate([np.zeros(channels, dtype=np.int32),
                                   line[:-channels]])
            ul = np.concatenate([np.zeros(channels, dtype=np.int32),
                                 prev[:-channels]])
            p = left + prev - ul
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - ul))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            filt = line - pred
        raw.append(f)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


MM_PIXEL_CHECK_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sum_r", LongType()),
    StructField("sum_g", LongType()),
    StructField("sum_b", LongType()),
    StructField("wsum_r", LongType()),
    StructField("wsum_g", LongType()),
    StructField("wsum_b", LongType()),
])


def mm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-grade correctness gate for the REAL PNG decoder: per doc,
    synthesize a deterministic PNG whose geometry and pixel values are
    pure arithmetic in ``doc_id`` (width ``4 + id % 13``, height
    ``3 + id % 11``, gray for even ids / RGB for odd, pixel value
    ``(id*37 + y*211 + x*97 + c*151) % 256``), encode it with
    ``encode_png`` (scanline filter ``y % 5`` — all five filter types),
    decode it back with ``decode_png``, and emit EXACT integer
    checksums of the decoded pixels: per-channel sums and
    position-weighted sums ``SUM((y*width + x + 1) * v)`` (weighted so
    a filter un-predictor bug that preserves totals still diverges).
    The DuckDB oracle computes the same checksums analytically from the
    pixel formula — the decoder's output is verified bit-for-bit
    against a closed form that never touches PNG bytes. Gray images
    report r=g=b (the ``png_pixel_stats`` convention). All-integer
    output: no float rounding in the hash. Same 100 TB shape as every
    multimodal op: Arrow-batched mapInPandas, no driver collect."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 13, 3 + d % 11
                nch = 1 if d % 2 == 0 else 3
                y = np.arange(h, dtype=np.int64)[:, None, None]
                x = np.arange(w, dtype=np.int64)[None, :, None]
                c = np.arange(nch, dtype=np.int64)[None, None, :]
                px = ((d * 37 + y * 211 + x * 97 + c * 151) % 256) \
                    .astype(np.uint8).reshape(h, w * nch)
                w2, h2, nch2, dec = decode_png(encode_png(px, nch))
                v = dec.reshape(h2 * w2, nch2).astype(np.int64)
                wt = np.arange(1, h2 * w2 + 1, dtype=np.int64)
                sums = v.sum(axis=0)
                wsums = (wt[:, None] * v).sum(axis=0)
                ch = (0, 0, 0) if nch2 == 1 else (0, 1, 2)
                rows.append((d, w2, h2, nch2,
                             *(int(sums[i]) for i in ch),
                             *(int(wsums[i]) for i in ch)))
            yield pd.DataFrame({
                "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "width": pd.Series([r[1] for r in rows], dtype="int32"),
                "height": pd.Series([r[2] for r in rows], dtype="int32"),
                "channels": pd.Series([r[3] for r in rows],
                                      dtype="int32"),
                "sum_r": pd.Series([r[4] for r in rows], dtype="int64"),
                "sum_g": pd.Series([r[5] for r in rows], dtype="int64"),
                "sum_b": pd.Series([r[6] for r in rows], dtype="int64"),
                "wsum_r": pd.Series([r[7] for r in rows], dtype="int64"),
                "wsum_g": pd.Series([r[8] for r in rows], dtype="int64"),
                "wsum_b": pd.Series([r[9] for r in rows], dtype="int64"),
            })

    return docs.mapInPandas(stats, schema=MM_PIXEL_CHECK_SCHEMA)


def mm_pixel_stats_oracle() -> str:
    # the analytic twin of the encode->decode round-trip: pixel value
    # v(y, x, c) = (doc_id*37 + y*211 + x*97 + c*151) % 256 over the
    # doc-derived geometry; flat index i enumerates (y, x) row-major,
    # so y = i // width, x = i % width, weight = i + 1
    def v(ch: str) -> str:
        return (f"((doc_id*37 + (i // width)*211 + (i % width)*97"
                f" + {ch}*151) % 256)")

    g = "(CASE WHEN channels = 1 THEN 0 ELSE 1 END)"
    b = "(CASE WHEN channels = 1 THEN 0 ELSE 2 END)"
    return f"""
        WITH p AS (
            SELECT doc_id,
                   CAST(4 + doc_id % 13 AS INT) AS width,
                   CAST(3 + doc_id % 11 AS INT) AS height,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
                       AS channels
            FROM documents
        ), g AS (
            SELECT doc_id, width, height, channels,
                   unnest(range(0, CAST(height AS BIGINT) * width)) AS i
            FROM p
        )
        SELECT doc_id, width, height, channels,
               CAST(SUM({v('0')}) AS BIGINT) AS sum_r,
               CAST(SUM({v(g)}) AS BIGINT) AS sum_g,
               CAST(SUM({v(b)}) AS BIGINT) AS sum_b,
               CAST(SUM((i + 1) * {v('0')}) AS BIGINT) AS wsum_r,
               CAST(SUM((i + 1) * {v(g)}) AS BIGINT) AS wsum_g,
               CAST(SUM((i + 1) * {v(b)}) AS BIGINT) AS wsum_b
        FROM g GROUP BY 1, 2, 3, 4
    """


AUDIO_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_frames", LongType()),
    StructField("duration_s", DoubleType()),   # rounded to 6 dp
    StructField("rms", DoubleType()),          # rounded to 6 dp, [0, 1]
])


def decode_wav(payload: bytes) -> tuple[int, int, int, "object"]:
    """REAL pure-stdlib WAV (PCM) decoder via the ``wave`` module:
    returns ``(sample_rate, channels, n_frames, samples)`` with
    ``samples`` a float64 numpy array of shape (n_frames, channels)
    normalized to [-1, 1]. 8/16/32-bit PCM; anything else (24-bit,
    compressed codecs) raises ValueError -> 'undecodable' upstream."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            sw, nch = w.getsampwidth(), w.getnchannels()
            sr, nf = w.getframerate(), w.getnframes()
            frames = w.readframes(nf)
    except Exception as e:
        raise ValueError(f"not a PCM WAV: {e}") from e
    if sw == 1:         # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) \
            / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if nch <= 0 or sr <= 0 or x.size != nf * nch:
        raise ValueError("inconsistent WAV header")
    return sr, nch, nf, x.reshape(nf, nch)


def wav_audio_stats(binary_df: DataFrame) -> DataFrame:
    """REAL audio feature extraction with zero codec dependencies:
    sample rate / channels / duration / overall RMS amplitude per PCM
    WAV payload (the audio twin of ``png_pixel_stats``). Undecodable
    payloads yield NULLs, never a stage failure; same Arrow-batched
    mapInPandas shape as every multimodal op."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    sr, nch, nf, x = decode_wav(bytes(payload))
                    rms = float(np.sqrt((x * x).mean())) if nf else 0.0
                    rows.append((int(doc_id), sr, nch, nf,
                                 round(nf / sr, 6), round(rms, 6)))
                except Exception:
                    rows.append((int(doc_id), None, None, None,
                                 None, None))
            yield pd.DataFrame({
                "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "sample_rate": pd.Series([r[1] for r in rows],
                                         dtype="Int32"),
                "channels": pd.Series([r[2] for r in rows],
                                      dtype="Int32"),
                "n_frames": pd.Series([r[3] for r in rows],
                                      dtype="Int64"),
                "duration_s": pd.Series([r[4] for r in rows],
                                        dtype="float64"),
                "rms": pd.Series([r[5] for r in rows], dtype="float64"),
            })

    return binary_df.mapInPandas(stats, schema=AUDIO_SCHEMA)


RESIZE_BOX = 256
MAX_FRAMES = 8

RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("new_width", IntegerType()),
    StructField("new_height", IntegerType()),
    StructField("resized_md5", StringType()),
])


def _fit_box(w: int, h: int, box: int = RESIZE_BOX) -> tuple[int, int]:
    """Aspect-preserving fit into box x box, never upscaling — the standard
    thumbnail contract. Double arithmetic written identically to the SQL
    oracle so results agree bit-for-bit."""
    s = min(box / w, box / h, 1.0)
    return max(1, int(w * s)), max(1, int(h * s))


def resize_features(binary_df: DataFrame) -> DataFrame:
    """(doc_id, payload) -> original + resized dimensions + a digest of the
    'resized' payload. STUB: production swaps the digest line for
    ``PIL.Image.resize`` on the decoded pixels; the mapInPandas plumbing
    (Arrow batches, explicit schema, partition-preserving) is the real
    100 TB shape either way."""
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _ = _fake_decode(payload)
                nw, nh = _fit_box(w, h)
                md5 = hashlib.md5(payload).hexdigest()
                out.append((int(doc_id), w, h, nw, nh,
                            hashlib.md5(
                                f"{md5}x{nw}x{nh}".encode()).hexdigest()))
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA])

    return binary_df.mapInPandas(resize, schema=RESIZE_SCHEMA)


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    binary = docs.selectExpr("doc_id",
                             "CAST(encode(text, 'utf-8') AS BINARY) AS payload")
    return resize_features(binary)


def mm_resize_oracle() -> str:
    # the fake decode + fit-box arithmetic is pure md5/double math, so the
    # whole resize pipeline is SQL-checkable (scale factor double ops are
    # written in the same order as _fit_box)
    w = "(1 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024)"
    h = "(1 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024)"
    s = (f"least(least({RESIZE_BOX}.0 / {w}, {RESIZE_BOX}.0 / {h}), 1.0)")
    nw = f"greatest(1, CAST(trunc({w} * {s}) AS INT))"
    nh = f"greatest(1, CAST(trunc({h} * {s}) AS INT))"
    return f"""
        SELECT doc_id,
               {w}::INT AS width,
               {h}::INT AS height,
               {nw} AS new_width,
               {nh} AS new_height,
               md5(md5(text) || 'x' || {nw} || 'x' || {nh}) AS resized_md5
        FROM documents
    """


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: frame count derives from the
    payload size (STUB for a container-header parse), then every
    ``stride``-th frame is sampled up to MAX_FRAMES and fingerprinted.
    All codegen expressions (sequence + explode) — sampling frame INDICES
    never touches Python; only the decode of chosen frames would (as a
    mapInPandas over the exploded rows, exactly the decode_binary_features
    shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.selectExpr(
                "doc_id",
                "md5(text) AS content_md5",
                "1 + CAST(length(text) % 240 AS INT) AS n_frames")
            .selectExpr(
                "doc_id", "n_frames",
                f"greatest(1, CAST(ceil(n_frames / {MAX_FRAMES}.0) AS INT)) "
                "AS stride",
                "content_md5")
            .selectExpr(
                "doc_id", "n_frames",
                "explode(sequence(0, n_frames - 1, stride)) AS frame_idx",
                "content_md5")
            .selectExpr(
                "doc_id", "n_frames", "frame_idx",
                "md5(content_md5 || ':' || CAST(frame_idx AS STRING)) "
                "AS frame_md5"))


def mm_frame_sample_oracle() -> str:
    return f"""
        WITH f AS (
            SELECT doc_id, md5(text) AS content_md5,
                   1 + CAST(strlen(text) % 240 AS INT) AS n_frames
            FROM documents
        ), s AS (
            SELECT doc_id, content_md5, n_frames,
                   greatest(1, CAST(ceil(n_frames / {MAX_FRAMES}.0) AS INT))
                       AS stride
            FROM f
        )
        SELECT doc_id, n_frames,
               CAST(unnest(range(0, n_frames, stride)) AS INT) AS frame_idx,
               md5(content_md5 || ':' ||
                   CAST(unnest(range(0, n_frames, stride)) AS VARCHAR))
                   AS frame_md5
        FROM s
    """


def mm_decode_features_oracle() -> str:
    # md5 of the utf-8 string == md5 of the payload bytes; the fake decode
    # is md5-hex arithmetic, so the whole pipeline is SQL-checkable
    return """
        SELECT doc_id,
               strlen(text) AS n_bytes,
               md5(text) AS content_md5,
               (1 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024)::INT
                   AS width,
               (1 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024)::INT
                   AS height,
               'fake/rgb8' AS format
        FROM documents
    """
