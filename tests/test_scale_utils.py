"""Skew salting and bucketed co-located joins (plans/scale.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

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


def test_upsert_day_partitions_merge_semantics(spark, tmp_path):
    """Keyed upsert == DuckDB MERGE semantics (update matched on
    (dt, key), insert otherwise), touching ONLY the delta's days."""
    import duckdb

    from maha_spark.plans.scale import upsert_day_partitions

    table = str(tmp_path / "t")
    base = (spark.range(3_000)
            .withColumn("dt", F.expr(
                "date_add(DATE '2024-04-01', CAST(id DIV 1000 AS INT))"))
            .withColumn("k", F.col("id"))
            .withColumn("v", F.expr("CAST(id * 10 AS BIGINT)"))
            .drop("id"))
    (base.repartition(F.col("dt")).write.mode("overwrite")
         .partitionBy("dt").parquet(table))
    untouched = os.path.join(table, "dt=2024-04-03")
    before = sorted((f, os.path.getmtime(os.path.join(untouched, f)))
                    for f in os.listdir(untouched))

    # 2 updates in day 1, 1 insert in day 1, 1 insert into a NEW day
    delta = spark.createDataFrame(
        [("2024-04-01", 5, -55), ("2024-04-01", 7, -77),
         ("2024-04-01", 99_001, -1), ("2024-04-09", 99_002, -2)],
        "dt string, k bigint, v bigint").withColumn(
            "dt", F.to_date("dt"))
    days = upsert_day_partitions(spark, delta, table, ["k"])
    assert days == ["2024-04-01", "2024-04-09"]

    got = sorted(map(tuple, spark.read.parquet(table)
                     .select("dt", "k", "v").collect()))
    con = duckdb.connect()
    exp = con.execute(f"""
        WITH cur AS (SELECT dt, k, v FROM read_parquet(
                 '{table}/*/*.parquet', hive_partitioning=1)),
             delta(dt, k, v) AS (VALUES
                 (DATE '2024-04-01', 5, -55),
                 (DATE '2024-04-01', 7, -77),
                 (DATE '2024-04-01', 99001, -1),
                 (DATE '2024-04-09', 99002, -2))
        SELECT dt, k, v FROM delta
        UNION ALL
        SELECT c.dt, c.k, c.v FROM cur c
        WHERE NOT EXISTS (SELECT 1 FROM delta d
                          WHERE d.dt = c.dt AND d.k = c.k)
    """).fetchall()
    # DuckDB reads the POST-upsert files, so 'cur' == got already; the
    # real oracle is idempotence + the direct checks below
    assert sorted(map(tuple, exp)) == got       # upsert is idempotent
    gd = dict(((str(r[0]), r[1]), r[2]) for r in got)
    assert gd[("2024-04-01", 5)] == -55 and gd[("2024-04-01", 7)] == -77
    assert gd[("2024-04-01", 99_001)] == -1
    assert gd[("2024-04-09", 99_002)] == -2
    assert gd[("2024-04-02", 1500)] == 15_000   # untouched day intact
    assert len(got) == 3_002                    # 2 inserts, 2 in-place

    # days outside the delta are physically untouched
    after = sorted((f, os.path.getmtime(os.path.join(untouched, f)))
                   for f in os.listdir(untouched))
    assert after == before


def test_upsert_rejects_ambiguous_delta(spark, tmp_path):
    from maha_spark.plans.scale import upsert_day_partitions
    table = str(tmp_path / "t")
    delta = spark.createDataFrame(
        [("2024-04-01", 5, 1), ("2024-04-01", 5, 2)],
        "dt string, k bigint, v bigint")
    with pytest.raises(ValueError, match="unique per match key"):
        upsert_day_partitions(spark, delta, table, ["k"])
    delta3 = spark.createDataFrame([("2024-04-01", 5)],
                                   "dt string, k bigint")
    (spark.createDataFrame([("2024-04-01", 5, 1)],
                           "dt string, k bigint, v bigint")
     .write.partitionBy("dt").parquet(table))
    with pytest.raises(ValueError, match="lacks table columns"):
        upsert_day_partitions(spark, delta3, table, ["k"])


def test_upsert_into_missing_table_is_insert(spark, tmp_path):
    from maha_spark.plans.scale import upsert_day_partitions
    table = str(tmp_path / "new")
    delta = spark.createDataFrame([("2024-04-01", 1, 10)],
                                  "dt string, k bigint, v bigint")
    assert upsert_day_partitions(spark, delta, table, ["k"]) \
        == ["2024-04-01"]
    assert spark.read.parquet(table).count() == 1


def test_delete_from_day_partitions(spark, tmp_path):
    """Row-level delete: tombstoned (dt, k) rows vanish, other rows and
    other days are untouched, and a fully-emptied day's dt= directory
    is REMOVED (dynamic overwrite cannot express an empty day)."""
    from maha_spark.plans.scale import delete_from_day_partitions

    table = str(tmp_path / "t")
    (spark.range(300)
     .withColumn("dt", F.expr(
         "date_add(DATE '2024-05-01', CAST(id DIV 100 AS INT))"))
     .withColumn("k", F.col("id"))
     .repartition(F.col("dt")).write.mode("overwrite")
     .partitionBy("dt").parquet(table))
    untouched = os.path.join(table, "dt=2024-05-03")
    before = sorted((f, os.path.getmtime(os.path.join(untouched, f)))
                    for f in os.listdir(untouched))

    # two rows from day 1, the ENTIRE day 2 (100 tombstones)
    tomb = (spark.range(100, 200)
            .withColumn("dt", F.lit("2024-05-02").cast("date"))
            .withColumn("k", F.col("id")).select("dt", "k")
            .union(spark.createDataFrame(
                [("2024-05-01", 5), ("2024-05-01", 7)],
                "dt string, k bigint").withColumn(
                    "dt", F.to_date("dt")).select("dt", "k")))
    days = delete_from_day_partitions(spark, tomb, table, ["k"])
    assert days == ["2024-05-01", "2024-05-02"]

    left = spark.read.parquet(table)
    assert left.count() == 198                      # 300 - 2 - 100
    assert left.filter("k in (5, 7)").count() == 0
    assert not os.path.exists(os.path.join(table, "dt=2024-05-02"))
    assert left.filter("dt = '2024-05-03'").count() == 100
    after = sorted((f, os.path.getmtime(os.path.join(untouched, f)))
                   for f in os.listdir(untouched))
    assert after == before                          # other days untouched

    # no-op shapes
    assert delete_from_day_partitions(
        spark, tomb.limit(0), table, ["k"]) == []
    assert delete_from_day_partitions(
        spark, tomb, str(tmp_path / "absent"), ["k"]) == []


def test_expire_day_partitions(spark, tmp_path):
    """Retention drops only days strictly before the cutoff, bumps the
    root mtime (cache + sidecar invalidation), and the next sidecar
    refresh purges the dead days' rows."""
    from maha_spark.plans.scale import expire_day_partitions
    from maha_spark.plans.skipping import (
        build_skipping_index, index_stale, refresh_skipping_index,
        table_index_dir)

    d = str(tmp_path)
    table = os.path.join(d, "t")
    (spark.range(400)
     .withColumn("dt", F.expr(
         "date_add(DATE '2024-05-01', CAST(id DIV 100 AS INT))"))
     .repartition(F.col("dt")).write.mode("overwrite")
     .partitionBy("dt").parquet(table))
    idx = table_index_dir(d, "t")
    build_skipping_index(spark, table, ["id"], idx)

    import time
    time.sleep(0.01)
    assert expire_day_partitions(table, "2024-05-03") \
        == ["2024-05-01", "2024-05-02"]
    assert sorted(p for p in os.listdir(table) if p.startswith("dt=")) \
        == ["dt=2024-05-03", "dt=2024-05-04"]
    assert spark.read.parquet(table).count() == 200
    assert index_stale(table, idx, "id")    # root bumped
    refresh_skipping_index(spark, table, idx)
    assert not index_stale(table, idx, "id")
    import pyarrow.parquet as pq
    dirs = set(pq.read_table(os.path.join(idx, "skip_id.parquet"),
                             columns=["dt_dir"])
               .column("dt_dir").to_pylist())
    assert dirs == {"dt=2024-05-03", "dt=2024-05-04"}
    assert expire_day_partitions(table, "2024-01-01") == []   # no-op


def test_upsert_and_delete_refuse_null_keys(spark, tmp_path):
    """NULL never matches under join equality: a NULL-keyed delta row
    would silently insert a duplicate and a NULL-keyed tombstone would
    delete nothing — both refuse before writing."""
    from maha_spark.plans.scale import (delete_from_day_partitions,
                                        upsert_day_partitions)
    table = str(tmp_path / "t")
    (spark.createDataFrame([("2024-04-01", 5, 1)],
                           "dt string, k bigint, v bigint")
     .write.partitionBy("dt").parquet(table))
    null_delta = spark.createDataFrame(
        [("2024-04-01", None, 2)], "dt string, k bigint, v bigint")
    with pytest.raises(ValueError, match="NULL in a match key"):
        upsert_day_partitions(spark, null_delta, table, ["k"])
    with pytest.raises(ValueError, match="NULL in a match key"):
        delete_from_day_partitions(
            spark, null_delta.select("dt", "k"), table, ["k"])


def test_upsert_then_sidecar_refresh_chain(spark, tmp_path):
    """The maintenance chain end-to-end: upsert makes the sidecar stale
    (root bump), needle scans stay correct via the stale-gate fallback,
    and refresh re-indexes ONLY the upserted days — pruning resumes
    with the new values findable."""
    from maha_spark.plans.scale import upsert_day_partitions
    from maha_spark.plans.skipping import (
        build_skipping_index, index_stale, needle_scan,
        refresh_skipping_index, table_index_dir)

    d = str(tmp_path)
    table = os.path.join(d, "t")
    (spark.range(2_000)
     .withColumn("dt", F.expr(
         "date_add(DATE '2024-04-01', CAST(id DIV 500 AS INT))"))
     .withColumn("k", F.col("id"))
     .withColumn("v", F.expr("CAST(id AS BIGINT)"))
     .drop("id")
     .repartition(F.col("dt")).write.mode("overwrite")
     .partitionBy("dt").parquet(table))
    idx = table_index_dir(d, "t")
    build_skipping_index(spark, table, ["v"], idx)
    untouched = _sidecar_day_files(spark, idx, "v", "2024-04-03")

    delta = spark.createDataFrame(
        [("2024-04-02", 600, 7_000_600)],
        "dt string, k bigint, v bigint").withColumn("dt", F.to_date("dt"))
    upsert_day_partitions(spark, delta, table, ["k"])
    assert index_stale(table, idx, "v")
    # stale gate: the NEW value is findable immediately (full scan)
    assert needle_scan(spark, table, idx, "v", 7_000_600).count() == 1

    refresh_skipping_index(spark, table, idx)
    assert not index_stale(table, idx, "v")
    assert needle_scan(spark, table, idx, "v", 7_000_600).count() == 1
    assert needle_scan(spark, table, idx, "v", 600).count() == 0  # replaced
    # untouched day's sidecar rows carried over verbatim
    assert _sidecar_day_files(spark, idx, "v", "2024-04-03") == untouched


def _sidecar_day_files(spark, idx, col, day):
    df = spark.read.parquet(os.path.join(idx, f"skip_{col}.parquet"))
    return sorted(r["file"] for r in
                  df.filter(F.col("dt_dir") == f"dt={day}")
                  .select("file").collect())
