"""Rollup advisor (registry/advisor.py): mining the request log for
rollup grains. The headline pin: fed the q4/q5-shaped workload and
production-scale cardinalities, the advisor re-derives the SAME rollup
designs rounds 6-7 hand-built (day x nation fk ~62k rows; + materialized
mktsegment; day x flag x status ~15k rows)."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.engine import engine_for_dir  # noqa: E402
from maha_spark.examples.contract import (  # noqa: E402
    build_contract_registry, materialize_events_rollup)
from maha_spark.examples.tpch import build_registry  # noqa: E402
from maha_spark.log.request_log import RequestLogEntry  # noqa: E402
from maha_spark.registry.advisor import (  # noqa: E402
    _NdvProbe, recommend_rollups)

SRC = "/root/testdata/sf0.001"
DAY = [{"field": "Day", "operator": "between",
        "from": "1995-01-01", "to": "2001-12-31"}]


def _req(fields, **kw):
    return json.dumps({"cube": "lineitem_stats",
                       "selectFields": [{"field": f} for f in fields],
                       "filterExpressions": DAY, **kw})


def _workload():
    return ([_req(["Nation Name", "Region Name", "Revenue"])] * 5
            + [_req(["Nation Name", "Market Segment", "Revenue"])] * 3
            + [_req(["Return Flag", "Line Status", "Revenue"])]
            + [json.dumps({"cube": "lineitem_stats", "queryType": "scan",
                           "selectFields": [{"field": "Revenue"}],
                           "filterExpressions": DAY,
                           "rowsPerPage": 10})])


def _prod_probe():
    """What-if cardinalities at ~600M fact rows (100 TB-ish shape)."""
    return _NdvProbe.fixed(
        rows={"lineitem": 600_000_000, "orders": 150_000_000,
              "customer": 15_000_000, "nation": 25, "region": 5},
        ndvs={("lineitem", "l_shipdate"): 2500,
              ("lineitem", "l_returnflag"): 3,
              ("lineitem", "l_linestatus"): 2,
              ("customer", "c_mktsegment"): 5,
              ("nation", "n_name"): 25, ("region", "r_name"): 5})


@pytest.fixture(scope="module")
def tpch_engine(spark):
    return engine_for_dir(spark, build_registry(), SRC)


def test_rederives_handbuilt_rollups(tpch_engine):
    recs = recommend_rollups(tpch_engine, _workload(), top_n=5,
                             probe=_prod_probe())
    # the scan request is ineligible by the planner's own serving rules
    assert recs and all(r.n_eligible == 9 for r in recs)
    by_est = {r.est_rows: r for r in recs}
    # day x cust-nation fk == lineitem_daily_nation (real table ~62k rows)
    nation = by_est[2500 * 25]
    assert nation.fact_cols == ()
    assert nation.chains[0].entry_dim == "customer_nation"
    assert not nation.chains[0].materialized
    assert nation.n_covered == 5
    # + materialized mktsegment == the round-7 q4 extension
    q4 = by_est[2500 * 25 * 5]
    assert ("customer", "Market Segment", "c_mktsegment") \
        in q4.chains[0].materialized
    assert q4.n_covered == 8        # serves the q5 shape too
    # day x flag x status == lineitem_daily (real table ~15k rows)
    daily = by_est[2500 * 3 * 2]
    assert sorted(daily.fact_cols) == ["l_linestatus", "l_returnflag"]
    assert daily.chains == ()
    # the consolidated union serves the whole eligible workload and wins
    union = by_est[2500 * 3 * 2 * 25 * 5]
    assert union.n_covered == 9
    assert recs[0] is union
    assert union.compression < 0.01


def test_entry_choice_prefers_materialization_over_wide_key(tpch_engine):
    """Serving Market Segment via the customer key would cost 15M rows
    per day-slice; nation-key x segment costs 125. No recommendation may
    pick the customer entry."""
    recs = recommend_rollups(tpch_engine, _workload(), top_n=5,
                             probe=_prod_probe())
    for r in recs:
        for ch in r.chains:
            assert ch.entry_dim != "customer", r.describe()


def test_scale_honest_empty_on_tiny_fact(tpch_engine):
    """At sf0.001 the fact has ~6k rows over ~2500 distinct days — no
    day-grain rollup compresses, and the advisor must say so rather
    than recommend a table the size of the fact."""
    assert recommend_rollups(tpch_engine, _workload()) == []


def test_entry_forms_accepted_and_garbage_skipped(tpch_engine):
    raw = _req(["Nation Name", "Revenue"])
    entries = [raw,                                  # raw JSON string
               RequestLogEntry(request_id="1", json_request=raw),
               RequestLogEntry(request_id="2",
                               json_request=raw).to_dict(),
               "{not json",                          # skipped
               RequestLogEntry(request_id="3", json_request="")]
    recs = recommend_rollups(tpch_engine, entries, probe=_prod_probe())
    assert recs and recs[0].n_eligible == 3


def test_day_derived_grain_cols_fold_into_day(tpch_engine):
    """Grouping by Month (a DerivedDimCol over the day column) must not
    enter the grain signature: any day-grain rollup serves it by
    re-declaring the derivation, so the signature is day-only and the
    estimate never hits the non-physical-column fallback."""
    logs = [_req(["Month", "Nation Name", "Revenue"])] * 2
    recs = recommend_rollups(tpch_engine, logs, probe=_prod_probe())
    assert recs
    assert recs[0].fact_cols == ()
    assert recs[0].n_covered == 2


def test_mixed_cube_log_streams_mined_independently(spark):
    """One log stream covering two cubes: each cube's workload is mined
    in its own physical namespace; coverage is per-cube."""
    eng = engine_for_dir(spark, build_contract_registry(), SRC)
    ev_day = {"field": "day", "operator": "between",
              "from": "2024-01-01", "to": "2024-12-31"}
    ev = json.dumps({"cube": "events_cube",
                     "selectFields": [{"field": "day"},
                                      {"field": "event_count"}],
                     "filterExpressions": [ev_day]})
    li = json.dumps({"cube": "tpch",
                     "selectFields": [{"field": "return_flag"},
                                      {"field": "sum_qty"}],
                     "filterExpressions": [
                         {"field": "day", "operator": "between",
                          "from": "1995-01-01", "to": "2001-12-31"}]})
    probe = _NdvProbe.fixed(
        rows={"events": 10_000_000, "lineitem": 600_000_000},
        ndvs={("events", "ts"): 30, ("lineitem", "l_shipdate"): 2500,
              ("lineitem", "l_returnflag"): 3})
    recs = recommend_rollups(eng, [ev, ev, li], top_n=4, probe=probe)
    cubes = {r.cube for r in recs}
    assert cubes == {"events_cube", "tpch"}
    for r in recs:
        assert r.n_eligible == (2 if r.cube == "events_cube" else 1)


def test_exact_grain_probe_admits_multiplied_high_card_grain(
        spark, tmp_path_factory):
    """The q2/q11 shape: GROUP BY a high-cardinality fact key over
    row-multiplied data. The independence bound (days x ndv(key)) hits
    the fact-rows cap and rejects; the exact struct-ndv probe measures
    the true (day, key) pair count — which duplication does NOT grow —
    and admits the rollup. Measure, don't guess."""
    from pyspark.sql import functions as F
    d = str(tmp_path_factory.mktemp("mult_fact"))
    for t in os.listdir(SRC):
        if t != "lineitem.parquet":
            os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    (li.withColumn("__m", F.explode(F.array(*[F.lit(i) for i in range(40)])))
       .drop("__m").write.parquet(os.path.join(d, "lineitem.parquet")))
    eng = engine_for_dir(spark, build_registry(), d)
    logs = [_req(["Part ID", "Revenue"])] * 3
    assert recommend_rollups(eng, logs) == []      # independence rejects
    recs = recommend_rollups(eng, logs, exact_grain_probe=True)
    assert recs and recs[0].fact_cols == ("l_partkey",)
    # true pair count ~ the unduplicated fact, far under the 40x fact
    assert recs[0].est_rows < 0.1 * recs[0].fact_rows
    assert recs[0].n_covered == 3


def test_exact_probe_disabled_under_injected_whatif(tpch_engine):
    """An injected what-if probe and the exact grain probe describe two
    different worlds (assumed cardinalities vs the physical bound
    table); mixing them would admit a grain measured on ~6k physical
    rows against an assumed 600M fact. With a what-if probe the
    refinement must stay off and the independence rejection stand."""
    logs = [_req(["Part ID", "Revenue"])] * 3
    probe = _NdvProbe.fixed(rows={"lineitem": 600_000_000},
                            ndvs={("lineitem", "l_shipdate"): 2500,
                                  ("lineitem", "l_partkey"): 20_000_000})
    assert recommend_rollups(tpch_engine, logs, probe=probe,
                             exact_grain_probe=True) == []


def test_already_served_requests_excluded(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv_rollup"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    materialize_events_rollup(spark, SRC, d)
    rolled = engine_for_dir(spark, build_contract_registry(), d)
    ev_day = {"field": "day", "operator": "between",
              "from": "2024-01-01", "to": "2024-12-31"}
    served = json.dumps({  # at the stored grain -> events_hourly serves
        "cube": "events_cube",
        "selectFields": [{"field": "hour"}, {"field": "event_type"},
                         {"field": "event_count"}],
        "filterExpressions": [ev_day]})
    unserved = json.dumps({  # exact distinct at day grain -> raw only
        "cube": "events_cube",
        "selectFields": [{"field": "day"}, {"field": "user_count"}],
        "filterExpressions": [ev_day]})
    recs = recommend_rollups(rolled, [served, served, unserved],
                             max_rows_frac=0.9)
    assert recs, "the unserved request should yield a recommendation"
    assert all(r.n_eligible == 1 for r in recs)
    assert recs[0].fact_cols == ()
    assert recs[0].est_rows <= 0.9 * recs[0].fact_rows


def test_ndv_served_from_stored_hll_partials(spark, tmp_path):
    """Advise-time ndv for a column whose HLL partial is already stored
    in a materialized rollup (events_hourly.user_hll) is union-merged
    from the stored sketches — NO approx_count_distinct scan of the raw
    fact for that column — and the estimate lands within the sketch's
    error bound of the exact distinct count."""
    import shutil

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(os.path.join(SRC, "events.parquet"),
                str(d / "events.parquet"))
    materialize_events_rollup(spark, str(d), str(d))
    eng = engine_for_dir(spark, build_contract_registry(), str(d))

    from maha_spark.registry.advisor import _NdvProbe as Probe
    probe = Probe(spark, eng.binding)
    req = json.dumps({
        "cube": "events_cube",
        "selectFields": [{"field": "user_id"}, {"field": "event_count"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "2024-01-01", "to": "2024-12-31"}],
    })
    recommend_rollups(eng, [req] * 3, probe=probe)

    assert ("events", "user_id") in probe.sketch_served
    assert ("events", "user_id") not in probe.raw_probed
    exact = eng.binding.table("events").select("user_id").distinct().count()
    got = probe.ndv("events", "user_id")
    assert abs(got - exact) <= max(2, 0.05 * exact), (got, exact)


def test_ndv_falls_back_to_raw_without_materialized_rollup(spark, tmp_path):
    """Same workload, rollup NOT materialized: the offer is registered
    but resolve falls back to the raw approx_count_distinct scan —
    advisor behavior on the plain sf fixtures is unchanged."""
    import shutil

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(os.path.join(SRC, "events.parquet"),
                str(d / "events.parquet"))
    eng = engine_for_dir(spark, build_contract_registry(), str(d))

    from maha_spark.registry.advisor import _NdvProbe as Probe
    probe = Probe(spark, eng.binding)
    req = json.dumps({
        "cube": "events_cube",
        "selectFields": [{"field": "user_id"}, {"field": "event_count"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "2024-01-01", "to": "2024-12-31"}],
    })
    recommend_rollups(eng, [req] * 3, probe=probe)
    assert ("events", "user_id") in probe.raw_probed
    assert not probe.sketch_served


def test_ndv_sketch_path_survives_empty_rollup(spark, tmp_path):
    """An EMPTY materialized rollup (fresh target, refresh window with
    no rows): hll_union_agg over nothing is NULL — the sketch path must
    fall back to the raw probe instead of crashing the advise pass."""
    import shutil

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(os.path.join(SRC, "events.parquet"),
                str(d / "events.parquet"))
    materialize_events_rollup(spark, str(d), str(d))
    # empty the rollup but keep its schema (and keep it NEWER than the
    # fact so the freshness gate is not what rescues us)
    roll = str(d / "events_hourly.parquet")
    empty = spark.read.parquet(roll).limit(0).localCheckpoint(eager=True)
    empty.write.mode("overwrite").parquet(roll)
    eng = engine_for_dir(spark, build_contract_registry(), str(d))

    from maha_spark.registry.advisor import _NdvProbe as Probe
    probe = Probe(spark, eng.binding)
    req = json.dumps({
        "cube": "events_cube",
        "selectFields": [{"field": "user_id"}, {"field": "event_count"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "2024-01-01", "to": "2024-12-31"}],
    })
    recommend_rollups(eng, [req] * 3, probe=probe)
    assert ("events", "user_id") in probe.raw_probed
    assert not probe.sketch_served
    assert probe.ndv("events", "user_id") > 0


def test_ndv_sketches_not_served_from_stale_rollup(spark, tmp_path):
    """A rollup older than the fact's latest write holds sketches of a
    STALE snapshot — the probe must use the raw path until the rollup
    is refreshed."""
    import shutil

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy(os.path.join(SRC, "events.parquet"),
                str(d / "events.parquet"))
    materialize_events_rollup(spark, str(d), str(d))
    # the fact gets rewritten AFTER the rollup was built. Date it one
    # hour into the future rather than copy-mtime+10: the old offset
    # was an implicit "materialization takes <10s" assumption, and a
    # contended full-suite run broke it (the rollup's stamp then read
    # NEWER than the fact and the probe legitimately served sketches)
    import time
    now = time.time() + 3600
    os.utime(str(d / "events.parquet"), (now, now))
    eng = engine_for_dir(spark, build_contract_registry(), str(d))

    from maha_spark.registry.advisor import _NdvProbe as Probe
    probe = Probe(spark, eng.binding)
    req = json.dumps({
        "cube": "events_cube",
        "selectFields": [{"field": "user_id"}, {"field": "event_count"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "2024-01-01", "to": "2024-12-31"}],
    })
    recommend_rollups(eng, [req] * 3, probe=probe)
    assert ("events", "user_id") in probe.raw_probed
    assert not probe.sketch_served
