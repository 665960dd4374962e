"""As-of join: each event matched to the user's most recent order at or
before the event time.

The reference engine has equi-joins only (SURVEY.md §2.3); an as-of join
is the canonical "operator Spark lacks" from the build brief, expressed
here as a composition of built-in DataFrame ops — the union-merge shape:

1. tag both sides and union them into one (user, time)-keyed stream;
2. one shuffle by user + sort within partitions (time ASC, orders before
   events at equal time — inclusive ``<=`` semantics);
3. a running ``last(..., ignoreNulls)`` window carries each order's
   attributes forward onto every later event row.

Scale: a single keyed shuffle + partition-local sort — the same cost as
one sort-merge join, with NO range-condition row explosion (a naive
``e.ts >= o.ts`` join is O(events x orders-per-user)). Skewed users
bound the sort, not memory (window frame is running, state is one row).
DuckDB's native ``ASOF LEFT JOIN`` is the oracle.

Ties: several orders on one (user, timestamp) are pre-reduced to the max
order key (arg_max) so both engines pick the same row deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import load_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    # raw order rows go straight into the merge: the window's sort order
    # (t ASC, is_order DESC, order_key ASC) puts a (user, instant)'s
    # orders in ascending order_key, so the running last(ignoreNulls)
    # lands on the MAX order_key of the latest instant — exactly the
    # arg_max tie-break the old pre-reduce groupBy(uid, t) computed,
    # without shuffling the order rows twice (guide §2.4)
    o_side = orders.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"), F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("order_key"),
        F.col("o_totalprice").alias("order_price"))
    e_side = ev.select(F.col("user_id").alias("uid"),
                       F.col("ts").alias("t"),
                       F.lit(0).alias("is_order"), "event_id",
                       F.lit(None).cast("long").alias("order_key"),
                       F.lit(None).cast("double").alias("order_price"))

    w = (Window.partitionBy("uid")
         .orderBy(F.col("t").asc(), F.col("is_order").desc(),
                  F.col("order_key").asc(), F.col("event_id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = (o_side.unionByName(e_side)
              .withColumn("order_key",
                          F.last("order_key", ignorenulls=True).over(w))
              .withColumn("order_price",
                          F.last("order_price", ignorenulls=True).over(w)))
    return (merged.filter(F.col("is_order") == 0)
            .select("event_id", F.col("uid").alias("user_id"),
                    F.date_format("t", _TS_FMT_SPARK).alias("event_ts"),
                    "order_key", "order_price"))


def asof_join_oracle() -> str:
    return f"""
        WITH o AS (
            SELECT o_custkey AS uid, o_orderdate AS t,
                   MAX(o_orderkey) AS order_key,
                   arg_max(o_totalprice, o_orderkey) AS order_price
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id,
               strftime(e.ts, '{_TS_FMT_DUCK}') AS event_ts,
               o.order_key, o.order_price
        FROM events e
        ASOF LEFT JOIN o ON e.user_id = o.uid AND e.ts >= o.t
    """
