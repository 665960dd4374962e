"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (dimensions derived from the payload's
md5) — but the Spark-side plumbing is real and tested: binary column
construction, explicit output schema, Arrow batch transfer, and a
partition-preserving mapInPandas pipeline.  Swap ``_fake_decode`` for a
PIL/ffmpeg call in production; everything else stands.

The driver-facing query (``mm_decode_features``) has a DuckDB oracle
because the fake decode is pure md5 arithmetic expressible in SQL.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
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


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB — deterministic stand-in for an image decoder.

    Production would do ``PIL.Image.open(io.BytesIO(payload))``; here the
    'decoded' dimensions derive from the payload digest so the pipeline is
    testable without codecs.
    """
    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[:4], 16) % 1024
    height = 1 + int(h[4:8], 16) % 1024
    return width, height, "fake/rgb8"


def decode_binary_features(binary_df: DataFrame) -> DataFrame:
    """(id, payload binary) -> typed features via Arrow-batched pandas.

    Scale notes: mapInPandas streams Arrow batches — no driver collect, no
    per-row Python calls; partitioning of the input is preserved, so at
    100 TB this runs one Python worker per core over ~10k-row batches.
    """
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "content_md5": [hashlib.md5(p).hexdigest()
                                for p in pdf["payload"]],
                "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                "format": [d[2] for d in decoded],
            })

    return binary_df.mapInPandas(decode, schema=DECODE_SCHEMA)


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque binary payload and
    run the decode pipeline over it."""
    docs = load_table(spark, sf_dir, "documents")
    binary = docs.selectExpr("doc_id",
                             "CAST(encode(text, 'utf-8') AS BINARY) AS payload")
    return decode_binary_features(binary)


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
