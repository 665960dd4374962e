"""Plan pins + planted-skew tests for the signature-dedup de-skew
(round 11): the keeper/count columns and the LSH bucket counts must be
map-side-combined groupBy aggregates joined back, never
``min/count().over(Window.partitionBy(<fingerprint>))`` — a fingerprint
is the duplicate-family key, so it is skewed by construction, and
WindowExec has no partial aggregation and cannot be AQE-skew-split.
Same recipe (and same pin style) as the ExactSubstr de-skew in
``tests/test_ops_substring.py``.
"""

from __future__ import annotations

from maha_spark.ops import dedup
from maha_spark.ops.common import release_scoped_caches


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _window_lines(plan: str) -> list[str]:
    return [ln for ln in plan.splitlines() if "Window" in ln]


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_signatures_plan_has_no_window_on_fingerprint(spark, sf_dir):
    """No WindowExec partitioned by content_hash or wordset_fp; both
    keeper/count aggregates carry map-side partials."""
    frame = dedup.dedup_signatures(spark, sf_dir)
    try:
        plan = _executed_plan(frame)
    finally:
        release_scoped_caches()
    wls = _window_lines(plan)
    assert all("content_hash#" not in ln and "wordset_fp#" not in ln
               for ln in wls), wls
    assert "partial_min" in plan and "partial_count" in plan


def test_bucket_count_plan_has_no_window(spark):
    """The LSH hot-bucket guard's per-(band,key) count is a groupBy
    joined back — the guard must never itself materialize the hot
    bucket it exists to defuse in one WindowExec sort task."""
    from pyspark.sql import functions as F
    bands = spark.range(100).select(
        (F.col("id") % 3).alias("band"),
        (F.col("id") % 7).alias("key"),
        F.col("id").alias("doc_id"))
    counted = dedup._with_bucket_count(bands, ("band", "key"))
    plan = _executed_plan(counted)
    assert not _window_lines(plan), plan
    assert "partial_count" in plan


def test_bucket_count_idempotent_passthrough(spark):
    from pyspark.sql import functions as F
    bands = spark.range(10).select(
        F.lit(0).alias("band"), F.lit(0).alias("key"),
        F.col("id").alias("doc_id"), F.lit(99).alias("__bn"))
    assert dedup._with_bucket_count(bands, ("band", "key")) is bands


def test_planted_boilerplate_family_100k(spark):
    """The skew case the de-skew exists for: one document duplicated
    10^5 times (plus a handful of unique docs). Keeper = min doc_id,
    dups = family size, exact for every member — and the job completes
    as a splittable aggregate instead of one 10^5-row sort task."""
    from pyspark.sql import functions as F
    n = 100_000
    boiler = "the same cookie banner text appears on every page"
    fam = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text"),
        F.lit("en").alias("lang"), F.lit("synthetic").alias("source"),
        F.lit(len(boiler)).alias("n_chars"))
    uniq = _docs(spark, [(n + i, f"unique document number {i}")
                         for i in range(5)])
    try:
        sig = dedup.dedup_signatures_frame(fam.unionByName(uniq))
        agg = sig.selectExpr(
            "count(*) AS rows",
            f"sum(CASE WHEN exact_dups = {n} AND exact_keeper = 0 "
            "     THEN 1 ELSE 0 END) AS fam_ok",
            f"sum(CASE WHEN wordset_dups = {n} AND wordset_keeper = 0 "
            "     THEN 1 ELSE 0 END) AS ws_ok",
            "sum(CASE WHEN exact_dups = 1 AND exact_keeper = doc_id "
            "     THEN 1 ELSE 0 END) AS uniq_ok").collect()[0]
    finally:
        release_scoped_caches()
    assert agg.rows == n + 5
    assert agg.fam_ok == n and agg.ws_ok == n and agg.uniq_ok == 5


def test_signatures_frame_matches_window_semantics(spark):
    """Bit-parity with the window formulation the groupBy replaced, on
    a mixed corpus (exact dup family, wordset-only dups via reordered
    words, uniques)."""
    rows = [(0, "alpha beta gamma"), (1, "alpha beta gamma"),
            (2, "gamma beta alpha"), (3, "delta epsilon"),
            (4, "zeta eta theta"), (5, "alpha beta gamma")]
    docs = _docs(spark, rows)
    try:
        got = {r.doc_id: r.asDict()
               for r in dedup.dedup_signatures_frame(docs).collect()}
    finally:
        release_scoped_caches()
    assert got[0]["exact_keeper"] == got[1]["exact_keeper"] == \
        got[5]["exact_keeper"] == 0
    assert got[0]["exact_dups"] == 3
    # doc 2 reorders the words: different content hash, same wordset
    assert got[2]["exact_dups"] == 1 and got[2]["exact_keeper"] == 2
    assert got[2]["wordset_keeper"] == 0 and got[2]["wordset_dups"] == 4
    assert got[3]["exact_dups"] == 1 and got[3]["wordset_dups"] == 1
    assert got[4]["wordset_keeper"] == 4
