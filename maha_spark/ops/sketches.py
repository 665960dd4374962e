"""Distinct-count set operations (theta-sketch parity).

The reference exposes Druid theta sketches with INTERSECT/UNION/NOT
estimators over pre-aggregated sketches (``DruidThetaSketchRollup``
RollupExpression.scala:92-93; set ops via ``ThetaSketchEstimator``
DerivedExpression.scala:1250-1266) — e.g. "users who did A and B".

Spark-native equivalent: one groupBy(user) pass building per-user
membership flags, then a single aggregation whose sums ARE the exact
set-operation cardinalities.  This is exact (strictly better than the
sketch estimate), oracle-checkable, and still one shuffle at 100 TB —
the per-user flag table is the natural pre-aggregation, and partial
aggregation (map-side combine) reduces each partition to its distinct
users before the exchange.

An HLL++ variant (``approx_set_counts``) covers the case where even the
per-user grain is too wide to materialize: approx_count_distinct over
conditional projections — approximate by construction, so it registers
without an oracle (rows-only driver check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import load_table

SET_A = "click"
SET_B = "purchase"


def sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap counts between two event types."""
    from pyspark.sql import functions as F
    ev = load_table(spark, sf_dir, "events")
    per_user = (ev.filter(F.col("event_type").isin(SET_A, SET_B))
                .groupBy("user_id")
                .agg(F.max(F.when(F.col("event_type") == SET_A, 1)
                           .otherwise(0)).alias("in_a"),
                     F.max(F.when(F.col("event_type") == SET_B, 1)
                           .otherwise(0)).alias("in_b")))
    return per_user.agg(
        F.sum("in_a").alias("users_a"),
        F.sum("in_b").alias("users_b"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("users_intersect"),
        F.count(F.lit(1)).alias("users_union"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).alias("users_a_not_b"))


def sketch_setops_oracle() -> str:
    return f"""
        SELECT CAST(SUM(in_a) AS BIGINT) AS users_a,
               CAST(SUM(in_b) AS BIGINT) AS users_b,
               CAST(SUM(in_a * in_b) AS BIGINT) AS users_intersect,
               COUNT(*) AS users_union,
               CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS users_a_not_b
        FROM (
            SELECT user_id,
                   MAX(CASE WHEN event_type = '{SET_A}' THEN 1 ELSE 0 END) AS in_a,
                   MAX(CASE WHEN event_type = '{SET_B}' THEN 1 ELSE 0 END) AS in_b
            FROM events
            WHERE event_type IN ('{SET_A}', '{SET_B}')
            GROUP BY user_id
        )
    """


def approx_set_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type (DruidHyperUniqueRollup parity,
    RollupExpression.scala:88-91). Approximate -> rows-only check."""
    from pyspark.sql import functions as F
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", 0.02)
                 .alias("approx_users"),
                 F.count(F.lit(1)).alias("n_events"))
            .orderBy("event_type"))
