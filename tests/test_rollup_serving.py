"""Aggregate-aware serving of the pre-aggregated events_hourly rollup.

The contract cube declares the rollup (stored at (hour, event_type) with
an exact distinct user count, NoopRollup + grain_cols); these tests pin
the three selection behaviors plus value-exactness of the rollup path:

1. rollup NOT materialized -> raw events serve everything (availability);
2. rollup materialized, request AT the stored grain -> rollup serves,
   values bit-identical to the raw-events plan;
3. request NEEDING the exact distinct at a COARSER grain -> raw events
   (the stored distinct must not be re-aggregated); summable-only
   requests at the coarser grain still take the rollup.
"""

from __future__ import annotations

import os
import shutil

import pytest

from maha_spark.engine import engine_for_dir
from maha_spark.examples.contract import (
    build_contract_registry, materialize_events_rollup,
)

SRC = "/root/testdata/sf0.001"
EV_DAY = {"field": "day", "operator": "between",
          "from": "2024-01-01", "to": "2024-12-31"}
Q17 = {
    "cube": "events_cube",
    "selectFields": [{"field": "hour"}, {"field": "event_type"},
                     {"field": "event_count"}, {"field": "total_value"},
                     {"field": "user_count"}],
    "filterExpressions": [EV_DAY],
}


@pytest.fixture(scope="module")
def rollup_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rollup"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    materialize_events_rollup(spark, SRC, d)
    return d


def test_unmaterialized_rollup_not_selected(spark):
    eng = engine_for_dir(spark, build_contract_registry(), SRC)
    assert eng.model(Q17).fact_table.name == "events"


def test_rollup_serves_at_stored_grain_exactly(spark, rollup_dir):
    raw = engine_for_dir(spark, build_contract_registry(), SRC)
    rolled = engine_for_dir(spark, build_contract_registry(), rollup_dir)
    assert rolled.model(Q17).fact_table.name == "events_hourly"
    a = sorted(map(tuple, raw.dataframe(Q17).collect()))
    b = sorted(map(tuple, rolled.dataframe(Q17).collect()))
    assert a == b and len(a) > 0


def test_exact_distinct_never_reaggregated(spark, rollup_dir):
    rolled = engine_for_dir(spark, build_contract_registry(), rollup_dir)
    day_users = {
        "cube": "events_cube",
        "selectFields": [{"field": "day"}, {"field": "user_count"}],
        "filterExpressions": [EV_DAY],
    }
    # needs the exact distinct at DAY grain -> must fall back to raw
    assert rolled.model(day_users).fact_table.name == "events"
    # summable-only at day grain -> the rollup re-aggregates losslessly
    day_sums = {
        "cube": "events_cube",
        "selectFields": [{"field": "day"}, {"field": "event_count"},
                         {"field": "total_value"}],
        "filterExpressions": [EV_DAY],
    }
    assert rolled.model(day_sums).fact_table.name == "events_hourly"
    raw = engine_for_dir(spark, build_contract_registry(), SRC)
    a = sorted(map(tuple, raw.dataframe(day_sums).collect()))
    b = sorted(map(tuple, rolled.dataframe(day_sums).collect()))
    assert a == b and len(a) > 0


def test_scan_never_served_from_rollup(spark, rollup_dir):
    """queryType=scan promises fact-grain rows; a pre-aggregated table
    (grain_cols declared) must never serve it even when cheaper."""
    rolled = engine_for_dir(spark, build_contract_registry(), rollup_dir)
    scan = {
        "cube": "events_cube", "queryType": "scan",
        "selectFields": [{"field": "hour"}, {"field": "event_type"}],
        "filterExpressions": [EV_DAY], "rowsPerPage": 100,
    }
    assert rolled.model(scan).fact_table.name == "events"


def test_timezone_request_never_served_from_rollup(spark, rollup_dir):
    """A shifted-timezone request re-buckets rows onto local days; stored
    UTC-hour partials cannot be split at fractional offsets (e.g. +05:30
    straddles stored hours), so the rollup is disqualified."""
    rolled = engine_for_dir(spark, build_contract_registry(), rollup_dir)
    req = {
        "cube": "events_cube",
        "selectFields": [{"field": "day"}, {"field": "event_count"}],
        "filterExpressions": [EV_DAY],
        "additionalParameters": {"timeZone": "Asia/Kolkata"},
    }
    assert rolled.model(req).fact_table.name == "events"
    raw = engine_for_dir(spark, build_contract_registry(), SRC)
    a = sorted(map(tuple, raw.dataframe(req).collect()))
    b = sorted(map(tuple, rolled.dataframe(req).collect()))
    assert a == b and len(a) > 0


def test_hll_partial_reaggregates_at_any_grain(spark, tmp_path_factory):
    """Druid hyperUnique ROLLUP parity: the stored HLL sketch partial
    merges at any coarser grain with estimates matching the raw-built
    sketch (union = per-register max; exact-identical in sparse mode,
    within a few counts past it where the direct build may use HIP),
    while staying within the sketch's error vs the exact distinct. The
    approx metric therefore has no grain guard — the rollup serves day
    grain."""
    from maha_spark.examples.contract import materialize_events_rollup

    d = str(tmp_path_factory.mktemp("hllroll"))
    import os
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    materialize_events_rollup(spark, SRC, d)

    raw = engine_for_dir(spark, build_contract_registry(), SRC)
    rolled = engine_for_dir(spark, build_contract_registry(), d)
    req = {
        "cube": "events_cube",
        "selectFields": [{"field": "day"}, {"field": "user_count_approx"}],
        "filterExpressions": [EV_DAY],
    }
    # approx distinct at DAY grain: the rollup qualifies (reaggregatable
    # sketch), unlike the exact user_count
    assert rolled.model(req).fact_table.name == "events_hourly"
    a = dict(map(tuple, raw.dataframe(req).collect()))
    b = dict(map(tuple, rolled.dataframe(req).collect()))
    assert len(a) == len(b) > 0
    for day, est in b.items():
        # identical in sparse mode; tolerate the HIP-vs-composite
        # estimator gap past it (both within sketch error)
        assert abs(est - a[day]) <= max(2, 0.02 * a[day])
    exact = dict(map(tuple, raw.dataframe(
        dict(req, selectFields=[{"field": "day"},
                                {"field": "user_count"}])).collect()))
    for day, est in b.items():
        assert abs(est - exact[day]) <= max(3, 0.05 * exact[day])


# ---------------------------------------------------- lineitem_daily rollup
LI_Q1 = {
    "cube": "tpch",
    "selectFields": [
        {"field": "return_flag"}, {"field": "line_status"},
        {"field": "sum_qty"}, {"field": "revenue"}, {"field": "charge"},
        {"field": "avg_qty"}, {"field": "avg_price"}, {"field": "avg_disc"},
        {"field": "line_count"}],
    "filterExpressions": [{"field": "day", "operator": "between",
                           "from": "1995-01-01", "to": "2002-12-31"}],
}
LI_DAY = LI_Q1["filterExpressions"][0]


@pytest.fixture(scope="module")
def li_rollup_dir(spark, tmp_path_factory):
    from maha_spark.examples.contract import materialize_lineitem_rollup
    d = str(tmp_path_factory.mktemp("liroll"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    materialize_lineitem_rollup(spark, SRC, d)
    return d


def test_lineitem_daily_serves_summable_requests_exactly(spark,
                                                         li_rollup_dir):
    """TPC-H Q1 through the daily rollup: ~6 stored rows per day replace
    the raw line items, and every metric (cents sums, derived averages,
    count) is bit-identical to the raw plan."""
    raw = engine_for_dir(spark, build_contract_registry(), SRC)
    rolled = engine_for_dir(spark, build_contract_registry(), li_rollup_dir)
    assert raw.model(LI_Q1).fact_table.name == "lineitem"
    assert rolled.model(LI_Q1).fact_table.name == "lineitem_daily"
    a = sorted(map(tuple, raw.dataframe(LI_Q1).collect()))
    b = sorted(map(tuple, rolled.dataframe(LI_Q1).collect()))
    assert a == b and len(a) > 0


def test_lineitem_daily_grain_guard_and_coverage_fallbacks(spark,
                                                           li_rollup_dir):
    """Exact order distinct: AT the stored grain the rollup serves it
    (each output group = one stored row); at a coarser grain it must not
    be re-aggregated (an order spans days) -> raw fact. Columns the
    rollup discarded (part FK, degenerate quantity dim, AverageRollup)
    also fall back by coverage."""
    raw = engine_for_dir(spark, build_contract_registry(), SRC)
    rolled = engine_for_dir(spark, build_contract_registry(), li_rollup_dir)
    full = {"cube": "tpch", "selectFields": [
        {"field": "day"}, {"field": "return_flag"},
        {"field": "line_status"}, {"field": "order_count"}],
        "filterExpressions": [LI_DAY]}
    assert rolled.model(full).fact_table.name == "lineitem_daily"
    a = sorted(map(tuple, raw.dataframe(full).collect()))
    b = sorted(map(tuple, rolled.dataframe(full).collect()))
    assert a == b and len(a) > 0

    coarse = {"cube": "tpch", "selectFields": [
        {"field": "return_flag"}, {"field": "order_count"}],
        "filterExpressions": [LI_DAY]}
    assert rolled.model(coarse).fact_table.name == "lineitem"

    for fields in ([{"field": "part_id"}, {"field": "revenue"}],
                   [{"field": "quantity_int"}, {"field": "revenue"}],
                   [{"field": "return_flag"},
                    {"field": "avg_price_rollup"}],
                   [{"field": "return_flag"},
                    {"field": "order_count_approx"}]):
        req = {"cube": "tpch", "selectFields": fields,
               "filterExpressions": [LI_DAY]}
        assert rolled.model(req).fact_table.name == "lineitem", fields


def test_lineitem_daily_never_serves_scan_or_timezone(spark, li_rollup_dir):
    rolled = engine_for_dir(spark, build_contract_registry(), li_rollup_dir)
    scan = {"cube": "tpch", "queryType": "scan",
            "selectFields": [{"field": "return_flag"},
                             {"field": "line_status"}],
            "filterExpressions": [LI_DAY], "rowsPerPage": 50}
    assert rolled.model(scan).fact_table.name == "lineitem"
    tz = {"cube": "tpch",
          "selectFields": [{"field": "day"}, {"field": "revenue"}],
          "filterExpressions": [LI_DAY],
          "additionalParameters": {"timeZone": "Asia/Kolkata"}}
    assert rolled.model(tz).fact_table.name == "lineitem"


# -------------------------------------------- (day, part) rollup: q2/q11
Q2 = {
    "cube": "tpch",
    "selectFields": [{"field": "part_id"}, {"field": "revenue"}],
    "filterExpressions": [{"field": "day", "operator": "between",
                           "from": "1995-01-01", "to": "2002-12-31"}],
    "sortBy": [{"field": "revenue", "order": "DESC"},
               {"field": "part_id", "order": "ASC"}],
    "paginationStartIndex": 5, "rowsPerPage": 15,
}
Q11 = {
    "cube": "tpch",
    "selectFields": [{"field": "part_id"}, {"field": "revenue"}],
    "filterExpressions": [{"field": "day", "operator": "between",
                           "from": "1995-01-01", "to": "2002-12-31"},
                          {"field": "revenue", "operator": ">",
                           "value": 9000}],
}


@pytest.fixture(scope="module")
def part_rollup_dir(spark, tmp_path_factory):
    from maha_spark.examples.contract import materialize_lineitem_part_rollup
    d = str(tmp_path_factory.mktemp("part_rollup"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    materialize_lineitem_part_rollup(spark, SRC, d)
    return d


def test_part_rollup_serves_q2_q11_bit_identically(spark, part_rollup_dir):
    """The v6 rollup closes the round-7 attribution finding: the q2/q11
    family (TopN / HAVING over GROUP BY l_partkey) serves from the
    (day, part) cents partials, bit-identical to the raw aggregate —
    including the part-chain join that projects the part pk."""
    raw = engine_for_dir(spark, build_contract_registry(), SRC)
    rolled = engine_for_dir(spark, build_contract_registry(),
                            part_rollup_dir)
    brand = {"cube": "tpch",
             "selectFields": [{"field": "brand"}, {"field": "revenue"}],
             "filterExpressions": [{"field": "day", "operator": "between",
                                    "from": "1995-01-01",
                                    "to": "2002-12-31"}]}
    for q in (Q2, Q11, brand):   # brand: part ATTRIBUTE grouped via the
        #                          chain over (day, part) partials —
        #                          lossless, the key determines the attr
        assert rolled.model(q).fact_table.name == "lineitem_daily_part"
        a = sorted(map(tuple, raw.dataframe(q).collect()))
        b = sorted(map(tuple, rolled.dataframe(q).collect()))
        assert a == b and len(a) > 0


def test_part_rollup_never_steals_other_grains(spark, part_rollup_dir):
    """Queries at the flag/status grain keep the cheaper lineitem_daily
    candidate (when materialized) or the raw fact — the part rollup only
    wins requests it alone covers."""
    rolled = engine_for_dir(spark, build_contract_registry(),
                            part_rollup_dir)
    q1 = {"cube": "tpch",
          "selectFields": [{"field": "return_flag"},
                           {"field": "line_status"}, {"field": "revenue"}],
          "filterExpressions": [{"field": "day", "operator": "between",
                                 "from": "1995-01-01",
                                 "to": "2002-12-31"}]}
    assert rolled.model(q1).fact_table.name == "lineitem"
