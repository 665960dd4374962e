"""Structured Streaming ingestion: events -> hourly-grain rollup.

Net-new relative to the reference (Maha has no streaming; SURVEY.md §2.9):
the same hourly cube the batch planner serves (``events_cube``) fed by a
``readStream`` with watermarked tumbling windows.

Scale design: file-source streaming with ``availableNow`` processes the
backlog in bounded micro-batches; the windowed aggregation is a standard
partial-agg + state-store pattern that scales with
``spark.sql.shuffle.partitions``.  Late events beyond the 1h watermark are
dropped (the correctness test feeds a single file = single micro-batch, so
watermarking cannot drop rows and the result equals the batch answer).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", LongType()),  # nanos (see binding.py nanos handling)
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def hourly_stream(spark: SparkSession, events_dir: str,
                  glob: str | None = None) -> DataFrame:
    """readStream -> watermark -> 1h tumbling window aggregation.

    ``events_dir`` must be a directory (Spark file-source requirement);
    ``glob`` optionally restricts which files in it are ingested.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (spark.readStream
              .schema(EVENT_SCHEMA)
              .format("parquet"))
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(events_dir)
    ev = raw.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return (ev
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"),
                     F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("event_count"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                  .alias("value_dec"))
            .select(
                F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss")
                 .alias("hour"),
                "event_type", "event_count",
                F.col("value_dec").cast("double").alias("total_value")))


def run_available_now(spark: SparkSession, sf_dir: str,
                      table_name: str = "stream_hourly") -> DataFrame:
    """Drain the events backlog through the streaming pipeline into an
    in-memory sink and return the materialized result."""
    agg = hourly_stream(spark, sf_dir, glob="events.parquet")
    with tempfile.TemporaryDirectory(prefix="maha-ckpt-") as ckpt:
        q = (agg.writeStream
             .format("memory")
             .queryName(table_name)
             .outputMode("complete")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
    return spark.table(table_name)


def streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_available_now(spark, sf_dir)


def streaming_hourly_oracle() -> str:
    return """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type,
               COUNT(*) AS event_count,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_value
        FROM events GROUP BY 1, 2
    """
