"""Mergeable frequent-items partials (core/freqitems.py): per-grain
exact top-k' + residual bounds, served at any coarser grain with
[lower, upper] count bounds and a provable top-k membership flag —
pinned against exact raw top-k and a bit-exact DuckDB SQL twin."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from maha_spark.core.freqitems import (  # noqa: E402
    FREQ_K, freq_items_partial, freq_topk_serve, freq_topk_serve_sql)


def _events(spark, sf_dir):
    return (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .withColumn("dt", F.to_date("ts"))
            .withColumn("month", F.date_trunc("month", "ts").cast("date")))


def _exact_topk(spark, sf_dir, k):
    """True per-month top-k user counts from raw rows (ties by value)."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import Window
    w = (Window.partitionBy("month")
         .orderBy(F.desc("n"), F.asc("value")))
    return (ev.groupBy("month", F.col("user_id").cast("string")
                       .alias("value"))
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def test_wide_partials_serve_exact(spark, sf_dir):
    """k' >= per-grain ndv: nothing is dropped, so serving any coarser
    grain IS the exact top-k — lb == ub == true count, all guaranteed."""
    ev = _events(spark, sf_dir)
    parts = freq_items_partial(ev, ["dt"], "user_id", k=FREQ_K)
    got = freq_topk_serve(parts, ["dt"], k=3).collect()
    assert got, "no partials built"
    exact = {(r["month"], r["value"]): r["n"]
             for r in _exact_topk(spark, sf_dir, 10**9).collect()}
    # recompute exact at dt grain for the comparison
    from pyspark.sql import Window
    w = (Window.partitionBy("dt").orderBy(F.desc("n"), F.asc("value")))
    ex = (ev.groupBy("dt", F.col("user_id").cast("string").alias("value"))
          .agg(F.count(F.lit(1)).alias("n"))
          .withColumn("rank", F.row_number().over(w))
          .filter(F.col("rank") <= 3).collect())
    exact_rows = sorted((r["dt"], r["rank"], r["value"], r["n"])
                        for r in ex)
    got_rows = sorted((r["dt"], r["rank"], r["value"], r["count_lb"])
                      for r in got)
    assert got_rows == exact_rows
    assert all(r["count_lb"] == r["count_ub"] and r["guaranteed"]
               for r in got)


def test_narrow_partials_bounds_hold_vs_raw(spark, sf_dir):
    """k' << ndv: stored day partials lose tail values, but every served
    bound must bracket the true count, and every guaranteed item must
    truly belong to a valid top-k."""
    k, kprime = 5, 4
    ev = _events(spark, sf_dir)
    parts = freq_items_partial(ev, ["dt", "month"], "user_id", k=kprime)
    served = freq_topk_serve(parts, ["month"], k=k).collect()
    assert served
    truth = {(r["month"], r["value"]): r["n"]
             for r in _exact_topk(spark, sf_dir, 10**9).collect()}
    # k-th true count per month (the membership bar)
    kth = {}
    for (m, _), n in truth.items():
        kth.setdefault(m, []).append(n)
    kth = {m: sorted(ns, reverse=True)[min(k, len(ns)) - 1]
           for m, ns in kth.items()}
    some_unguaranteed = False
    for r in served:
        true_n = truth[(r["month"], r["value"])]
        assert r["count_lb"] <= true_n <= r["count_ub"], \
            f"bounds violated for {r}"
        if r["guaranteed"]:
            assert true_n >= kth[r["month"]], \
                f"guaranteed item below the top-{k} bar: {r}"
        else:
            some_unguaranteed = True
    # the narrow build must actually exercise the uncertain path
    assert some_unguaranteed or all(
        r["count_lb"] == r["count_ub"] for r in served)


def test_sql_twin_bit_parity(spark, duck, sf_dir, tmp_path):
    """freq_topk_serve == its ANSI twin over the same stored partials,
    bit-for-bit (exact integer arithmetic end to end)."""
    ev = _events(spark, sf_dir)
    parts = freq_items_partial(ev, ["dt", "month"], "user_id", k=6)
    pdir = str(tmp_path / "freq_partials")
    parts.write.parquet(pdir)
    stored = spark.read.parquet(pdir)

    got = [(str(r["month"]), r["value"], r["count_lb"], r["count_ub"],
            r["rank"], r["guaranteed"])
           for r in freq_topk_serve(stored, ["month"], k=4).collect()]

    duck.execute(f"CREATE OR REPLACE VIEW freq_p AS "
                 f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
    sql = freq_topk_serve_sql("freq_p", ["month"], k=4)
    want = [(str(r[0])[:10], r[1], int(r[2]), int(r[3]), int(r[4]),
             bool(r[5]))
            for r in duck.execute(sql).fetchall()]
    assert got == want


def test_tie_break_is_deterministic(spark):
    """Equal counts order by value ascending — engine/run independent."""
    df = spark.createDataFrame(
        [("g", v) for v in ["b", "a", "c", "a", "c", "b"]], "g string, v string")
    parts = freq_items_partial(df, ["g"], "v", k=2)
    got = freq_topk_serve(parts, ["g"], k=3).collect()
    # only STORED values can be reported: c fell into the residual (all
    # counts tie at 2 and the build keeps the k'=2 smallest values), so
    # a k=3 serve returns two rows — and each is only tie-guaranteed
    # (lb == the residual bound), which the >= semantics accept
    assert [(r["value"], r["rank"], r["guaranteed"]) for r in got] == \
        [("a", 1, True), ("b", 2, True)]
    # all counts equal (2): stored top-2 keeps a,b; c is the tail
    row = parts.collect()[0]["freq_items"]
    assert sorted(row["items"].keys()) == ["a", "b"]
    assert row["others_total"] == 2 and row["others_max"] == 2
    assert row["total"] == 6


def test_op_matches_inline_oracle(spark, duck, sf_dir):
    """The op-level wrapper (ops/freqtopk.py) against its inline
    build+serve ANSI twin — the driver-contract-grade check."""
    from maha_spark.ops.freqtopk import freq_topk, freq_topk_oracle
    got = [(r["week"], r["value"], r["count_lb"], r["count_ub"],
            r["rank"], r["guaranteed"])
           for r in freq_topk(spark, sf_dir).collect()]
    want = [(r[0], r[1], int(r[2]), int(r[3]), int(r[4]), bool(r[5]))
            for r in duck.execute(freq_topk_oracle()).fetchall()]
    assert got == want and got


def test_serve_plan_single_pass(spark):
    """The serve must compile to a SINGLE pass over the stored items
    (r12 shape): the threat bound (max count_ub among rank > k) is a
    second window function over the same group partitioning, evaluated
    in the same sorted pass as the rank — NOT a groupBy + self-join.
    The pre-r12 shape consumed the ranked subtree twice (the stored-item
    explode and aggregation ran once per consumer when uncached) and
    paid an aggregation exchange plus a join for a per-group scalar;
    its rank<=k branch carried a WindowGroupLimit, but the threat
    branch inherently consumes every row, so the pushdown never saved
    the full sort. Pins: the explode appears ONCE in the plan, exactly
    one join (items x caps — threat no longer joins), and no exchange
    between the two window operators (same partitioning). The BUILD
    intentionally has no WindowGroupLimit: every rank feeds either the
    kept map or the residual scalars, so all rows are consumed —
    asserted so an 'optimization' that drops tail rows fails loudly."""
    df = (spark.range(1000)
          .selectExpr("CAST(id % 37 AS STRING) AS v", "id % 3 AS g"))
    parts = freq_items_partial(df, ["g"], "v", k=4)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    assert "WindowGroupLimit" not in \
        parts._jdf.queryExecution().explainString(mode)
    served = freq_topk_serve(parts.cache(), ["g"], k=2)
    plan = served._jdf.queryExecution().explainString(mode)
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    # pin the SERVE portion only: the cached partials' stored build plan
    # (inside InMemoryRelation) has its own Window/Exchange nodes
    imr = [i for i, ln in enumerate(lines) if "InMemoryRelation" in ln]
    if imr:
        lines = lines[:imr[0]]
    assert sum("Generate" in ln for ln in lines) == 1, tree
    assert sum("Join" in ln for ln in lines) == 1, tree
    # the two Window operators share one sort/partitioning: no Exchange
    # or Sort may sit between them
    widx = [i for i, ln in enumerate(lines) if "Window (" in ln]
    assert len(widx) == 2, tree
    between = lines[min(widx) + 1:max(widx)]
    assert not any("Exchange" in ln or "Sort" in ln for ln in between), tree
    parts.unpersist()


def test_reserved_group_col_names_refuse(spark):
    df = spark.createDataFrame([("g", "x")], "g string, v string")
    parts = freq_items_partial(df, ["g"], "v", k=2) \
        .withColumnRenamed("g", "value")
    with pytest.raises(ValueError, match="collide"):
        freq_topk_serve(parts, ["value"], k=1)


def test_nulls_excluded_and_empty_grains_absent(spark):
    df = spark.createDataFrame(
        [("g1", "x"), ("g1", None), ("g2", None)], "g string, v string")
    parts = freq_items_partial(df, ["g"], "v", k=4).collect()
    assert len(parts) == 1 and parts[0]["g"] == "g1"
    assert parts[0]["freq_items"]["total"] == 1
