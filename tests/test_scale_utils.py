"""Skew salting and bucketed co-located joins (plans/scale.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.plans.scale import (  # noqa: E402
    bucketed_join, salted_join, write_bucketed,
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F
    # skewed fact: 90% of rows share key 1
    fact = spark.range(10_000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 1 ELSE id % 100 END AS k",
        "id AS v")
    dim = spark.range(100).selectExpr("id AS k", "concat('n', id) AS name")
    plain = fact.join(dim, "k", "left").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.max("name").alias("nm"))
    salted = salted_join(fact, dim, "k", n_salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.max("name").alias("nm"))
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))
    # the join key is (k, salt): shows up in the physical join criteria
    phys = _physical(salted_join(fact, dim, "k", n_salt=8))
    assert "__salt" in phys


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")) \
            .select("l_orderkey", "l_quantity")
        od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
            .select("o_orderkey", "o_orderpriority") \
            .withColumnRenamed("o_orderkey", "l_orderkey")
        write_bucketed(li, "t_li_b", "l_orderkey", buckets=8)
        write_bucketed(od, "t_od_b", "l_orderkey", buckets=8)
        j = bucketed_join(spark, "t_li_b", "t_od_b", "l_orderkey")
        phys = _physical(j)
        assert "SortMergeJoin" in phys
        assert "Exchange" not in phys  # co-located: no shuffle at all
        # sanity: same row count as the shuffle join on raw parquet
        assert j.count() == li.join(od, "l_orderkey").count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_od_b")


def test_compact_day_partitions_bit_identical_and_scoped(spark, tmp_path):
    """Fragmented dt= directories are bin-packed back to one file per
    day with the row multiset unchanged; already-compact days are
    physically untouched (mtime + file listing pinned)."""
    import os

    from pyspark.sql import functions as F

    from maha_spark.plans.scale import (compact_day_partitions,
                                        overwrite_day_partitions)

    dst = str(tmp_path / "t")
    df = spark.range(3000).select(
        F.concat(F.lit("2024-01-0"),
                 (F.col("id") % 3 + 1).cast("string")).alias("dt"),
        F.col("id").alias("v"))
    overwrite_day_partitions(df, dst)
    # fragment two of the three days: append extra small files
    for day in ("2024-01-01", "2024-01-02"):
        extra = spark.range(5).select(
            F.lit(day).alias("dt"), (F.col("id") + 10_000).alias("v"))
        (extra.repartition(4).write.mode("append")
         .partitionBy("dt").parquet(dst))
    before = sorted(map(tuple, spark.read.parquet(dst).collect()))
    compact_dir = os.path.join(dst, "dt=2024-01-03")
    untouched = sorted(os.listdir(compact_dir))
    mtime = os.path.getmtime(compact_dir)

    days = compact_day_partitions(spark, dst, min_files=2)
    assert sorted(days) == ["2024-01-01", "2024-01-02"]
    after = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert after == before                       # bit-identical rows
    for day in days:                             # now one file per day
        p = os.path.join(dst, f"dt={day}")
        assert len([f for f in os.listdir(p)
                    if f.endswith(".parquet")]) == 1
    assert sorted(os.listdir(compact_dir)) == untouched
    assert os.path.getmtime(compact_dir) == mtime
    # idempotent: nothing left to compact
    assert compact_day_partitions(spark, dst, min_files=2) == []


def test_compact_day_partitions_honors_target_file_size(spark, tmp_path):
    """A day LARGER than target_file_mb is rewritten into ~ceil(bytes /
    target) files, not collapsed into one oversized file (the writer's
    per-task records-per-file cap) — and the rewrite stays
    bit-identical."""
    import os

    from pyspark.sql import functions as F

    from maha_spark.plans.scale import compact_day_partitions

    dst = str(tmp_path / "t")
    # ~3-4 MB of incompressible payload in ONE day, fragmented 8 ways
    df = spark.range(100_000).select(
        F.lit("2024-02-01").alias("dt"),
        F.md5(F.col("id").cast("string")).alias("payload"))
    (df.repartition(8).write.mode("overwrite")
     .partitionBy("dt").parquet(dst))
    day_dir = os.path.join(dst, "dt=2024-02-01")
    n_before = len([f for f in os.listdir(day_dir)
                    if f.endswith(".parquet")])
    assert n_before == 8
    before = sorted(map(tuple, spark.read.parquet(dst).collect()))

    days = compact_day_partitions(spark, dst, target_file_mb=1,
                                  min_files=2)
    assert days == ["2024-02-01"]
    after = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert after == before
    n_after = len([f for f in os.listdir(day_dir)
                   if f.endswith(".parquet")])
    # split toward the 1 MB target: more than one file, fewer than the
    # fragment count (compressed-bytes/row estimate -> approximate)
    assert 1 < n_after < n_before
