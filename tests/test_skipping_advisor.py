"""Skipping-index advisor (registry/skip_advisor.py): the ledger-mined
answer to "which columns deserve a data-skipping sidecar". Contract
under test: needle filters on eligible plain DimCols rank by frequency,
planner-ineligible columns (derived, static-mapped, day/partition) are
never recommended, and the apply side builds sidecars the planner then
prunes with — mine -> build -> engine request reads fewer files.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from maha_spark.engine import engine_for_dir  # noqa: E402
from maha_spark.examples.contract import build_contract_registry  # noqa: E402
from maha_spark.registry.skip_advisor import (  # noqa: E402
    build_recommended_indexes, recommend_skipping_indexes)

SRC = "/root/testdata/sf0.001"


def _needle(value, extra=None):
    req = {
        "cube": "events_cube",
        "selectFields": [{"field": "user_id"}, {"field": "event_count"}],
        "filterExpressions": [
            {"field": "day", "operator": "between",
             "from": "2024-01-01", "to": "2024-12-31"},
            {"field": "user_id", "operator": "=", "value": value}],
    }
    if extra:
        req["filterExpressions"].append(extra)
    return json.dumps(req)


@pytest.fixture(scope="module")
def eng(spark):
    return engine_for_dir(spark, build_contract_registry(), SRC)


def test_recommends_frequent_needle_column(eng):
    logs = [_needle(i) for i in range(5)] + [
        _needle(9, extra={"field": "event_type", "operator": "in",
                          "values": ["click", "view"]})]
    recs = recommend_skipping_indexes(eng, logs)
    assert [(r.table, r.column, r.count) for r in recs] == [
        ("events", "user_id", 6)]   # event_type: 1 < min_count
    assert recs[0].operators == ("=",)
    recs2 = recommend_skipping_indexes(eng, logs, min_count=1)
    assert ("events", "event_type", 1) in [
        (r.table, r.column, r.count) for r in recs2]


def test_day_and_ineligible_columns_never_recommended(eng):
    """The mandatory Day bound appears in EVERY request; partition
    pruning already serves it — recommending it would waste a sidecar.
    Derived columns are planner-ineligible and must not appear either."""
    logs = [_needle(i) for i in range(4)] + [json.dumps({
        "cube": "events_cube",
        "selectFields": [{"field": "hour"}, {"field": "event_count"}],
        "filterExpressions": [
            {"field": "day", "operator": "between",
             "from": "2024-01-01", "to": "2024-12-31"},
            {"field": "hour", "operator": "=",
             "value": "2024-01-01 05:00:00"}],   # derived (date_trunc)
    })] * 3
    recs = recommend_skipping_indexes(eng, logs, min_count=1)
    cols = {(r.table, r.column) for r in recs}
    assert ("events", "user_id") in cols
    for t, c in cols:
        assert c not in ("event_day", "ts", "dt", "event_hour"), (t, c)


def test_invalid_entries_skipped(eng):
    logs = ["{not json", json.dumps({"cube": "nope"}), _needle(1),
            _needle(2)]
    recs = recommend_skipping_indexes(eng, logs)
    assert [(r.table, r.column, r.count) for r in recs] == [
        ("events", "user_id", 2)]


def test_mine_build_prune_loop(spark, tmp_path):
    """End-to-end: ledger -> recommendation -> build_recommended_indexes
    -> the next engine request on the same needle reads a pruned fact
    file list with identical rows."""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    for t in os.listdir(SRC):
        if t != "events.parquet":
            os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    (ev.withColumn("dt", F.to_date("ts"))
       .withColumn("ub", F.expr("CAST(user_id % 4 AS INT)"))
       .repartition(4, F.col("ub")).sortWithinPartitions("user_id")
       .drop("ub")
       .write.mode("overwrite").partitionBy("dt")
       .parquet(os.path.join(d, "events")))
    eng = engine_for_dir(spark, build_contract_registry(), d)

    logs = [_needle(13) for _ in range(3)]
    recs = recommend_skipping_indexes(eng, logs)
    assert [(r.table, r.column) for r in recs] == [("events", "user_id")]
    built = build_recommended_indexes(spark, d, recs)
    assert built and os.path.isdir(
        os.path.join(d, "_skipidx", "events", "skip_user_id.parquet"))

    got = eng.dataframe(_needle(13))
    ev_files = [f for f in got.inputFiles() if "/events/" in f]
    n_files = sum(
        len([f for f in os.listdir(os.path.join(d, "events", p))
             if f.endswith(".parquet")])
        for p in os.listdir(os.path.join(d, "events"))
        if p.startswith("dt="))
    assert 0 < len(ev_files) < n_files
    exp = spark.read.parquet(os.path.join(d, "events")) \
        .filter("user_id = 13") \
        .groupBy("user_id").agg(F.sum(F.lit(1)).alias("event_count"))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, exp.collect()))


def test_live_ledger_entries_mine_directly(spark, tmp_path):
    """The advisor consumes the engine's OWN RequestLogEntry stream
    (CollectingRequestLogWriter), not just raw JSON — the live loop:
    serve needle traffic -> ledger -> recommend -> build -> prune."""
    from maha_spark.engine import MahaSparkEngine
    from maha_spark.log.request_log import CollectingRequestLogWriter
    from maha_spark.plans.binding import ParquetBinding

    d = str(tmp_path / "sf")
    os.makedirs(d)
    for t in os.listdir(SRC):
        if t != "events.parquet":
            os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    (ev.withColumn("dt", F.to_date("ts"))
       .withColumn("ub", F.expr("CAST(user_id % 4 AS INT)"))
       .repartition(4, F.col("ub")).sortWithinPartitions("user_id")
       .drop("ub")
       .write.mode("overwrite").partitionBy("dt")
       .parquet(os.path.join(d, "events")))
    writer = CollectingRequestLogWriter()
    eng = MahaSparkEngine(spark, build_contract_registry(),
                          ParquetBinding(spark, d),
                          request_logger=writer)
    for i in (13, 14, 15):
        out = eng.execute(_needle(i))
        assert "rows" in out
    assert len(writer.entries) == 3

    recs = recommend_skipping_indexes(eng, writer.entries)
    assert [(r.table, r.column, r.count) for r in recs] == [
        ("events", "user_id", 3)]
    build_recommended_indexes(spark, d, recs)
    got = eng.dataframe(_needle(13))
    ev_files = [f for f in got.inputFiles() if "/events/" in f]
    n_files = sum(
        len([f for f in os.listdir(os.path.join(d, "events", p))
             if f.endswith(".parquet")])
        for p in os.listdir(os.path.join(d, "events"))
        if p.startswith("dt="))
    assert 0 < len(ev_files) < n_files


def test_zorder_recommendation_needs_multiple_needle_columns(eng):
    """Z-order advice: only tables with needles on >= 2 columns (a
    single needle column is served by sort/sidecar alone); columns
    ranked by needle frequency."""
    from maha_spark.registry.skip_advisor import recommend_zorder

    single = recommend_skipping_indexes(eng, [_needle(i) for i in
                                              range(3)])
    assert recommend_zorder(single) == {}

    mixed = [_needle(i, extra={"field": "event_type", "operator": "in",
                               "values": ["click"]}) for i in range(2)] \
        + [_needle(9)]
    recs = recommend_skipping_indexes(eng, mixed)
    assert recommend_zorder(recs) == {
        "events": ["user_id", "event_type"]}


def test_equality_needles_on_uncanonical_dtypes_excluded():
    """An equality-only workload on a dtype the planner's needle
    canonicalization abstains on (decimals, timestamps) gains nothing
    from a sidecar — the advisor must not recommend building one."""
    from maha_spark.core.types import (DateType, DecType, IntType,
                                       StrType, TimestampType)
    from maha_spark.registry.skip_advisor import _canon_supported
    assert _canon_supported(IntType())
    assert _canon_supported(StrType())
    assert _canon_supported(DateType())
    assert not _canon_supported(DecType())
    assert not _canon_supported(TimestampType())


def test_dim_driven_traffic_recommends_driving_fk(eng):
    """A bounded-page dim-driven request consults a sidecar on the
    driving fk (planner page-key pruning) — repeated q6-shaped traffic
    must rank lineitem.l_orderkey for indexing."""
    req = json.dumps({
        "cube": "tpch",
        "selectFields": [{"field": "order_key"},
                         {"field": "order_priority"},
                         {"field": "revenue"}],
        "filterExpressions": [
            {"field": "day", "operator": "between",
             "from": "1995-01-01", "to": "2002-12-31"}],
        "sortBy": [{"field": "order_priority", "order": "ASC"}],
        "forceDimensionDriven": True,
        "rowsPerPage": 25,
    })
    recs = recommend_skipping_indexes(eng, [req, req, req])
    hit = [r for r in recs
           if r.table == "lineitem" and r.column == "l_orderkey"]
    assert hit and hit[0].count == 3
    assert hit[0].operators == ("dim-driven-page",)

    # an UNBOUNDED dim-driven page pushes no key set -> no signal
    unbounded = json.loads(req)
    del unbounded["rowsPerPage"]
    unbounded["distinct"] = True
    recs2 = recommend_skipping_indexes(eng, [json.dumps(unbounded)] * 3,
                                       min_count=1)
    assert not [r for r in recs2 if r.column == "l_orderkey"]
