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
