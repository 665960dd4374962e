"""Streaming-maintained pre-aggregated rollup: the stream's output is
registered as a cheaper fact candidate and the planner serves covered
queries from it, bit-exactly (fact/Fact.scala newRollUp semantics with
Structured Streaming as the maintenance job)."""

from __future__ import annotations

import pytest

DAY = {"field": "day", "operator": "between",
       "from": "1995-01-01", "to": "2002-12-31"}


@pytest.fixture(scope="module")
def rollup_env(spark, sf_dir, tmp_path_factory):
    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.stream_rollup import (
        build_stream_rollup_registry, materialize_hourly_rollup)

    base_dir = str(tmp_path_factory.mktemp("stream-rollup"))
    materialize_hourly_rollup(spark, sf_dir, base_dir)
    return engine_for_dir(spark, build_stream_rollup_registry(), base_dir)


def _rows(engine, select, revision=None):
    req = {"cube": "events_cube",
           "selectFields": [{"field": f} for f in select],
           "filterExpressions": [DAY]}
    df = engine.dataframe(req)
    return sorted(tuple(r) for r in df.collect())


def test_hour_grain_served_from_streamed_rollup(rollup_env):
    m = rollup_env.model({
        "cube": "events_cube",
        "selectFields": [{"field": "hour"}, {"field": "event_type"},
                         {"field": "event_count"},
                         {"field": "total_value"}],
        "filterExpressions": [DAY]})
    assert m.fact_table.name == "events_hourly"
    assert m.fact_table.cost == 100


def test_user_count_falls_back_to_raw_events(rollup_env):
    m = rollup_env.model({
        "cube": "events_cube",
        "selectFields": [{"field": "event_type"},
                         {"field": "user_count"}],
        "filterExpressions": [DAY]})
    assert m.fact_table.name == "events"


def test_rollup_answers_equal_base_answers(rollup_env, spark, sf_dir):
    """Same cube, two physical plans: the streamed rollup result must be
    bit-identical to the raw-events result at hour grain AND after a
    coarser re-aggregation (partials re-summed)."""
    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.stream_rollup import (
        build_stream_rollup_registry)

    # base-only engine: same registry minus the rollup candidate
    reg = build_stream_rollup_registry()
    cube = reg.fact("events_cube")
    cube.tables = [t for t in cube.tables if t.name == "events"]
    base_engine = engine_for_dir(spark, reg, sf_dir)

    for select in (["hour", "event_type", "event_count", "total_value"],
                   ["event_type", "event_count", "total_value"],
                   ["day", "total_value"]):
        got = _rows(rollup_env, select)
        want = _rows(base_engine, select)
        assert got == want, f"rollup mismatch for {select}"


def test_rollup_day_filter_prunes_to_rollup_scan(rollup_env):
    df = rollup_env.dataframe({
        "cube": "events_cube",
        "selectFields": [{"field": "hour"}, {"field": "event_count"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "1998-01-01", "to": "1998-01-31"}]})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "events_hourly" in plan
