"""Join-aware rollup serving: the aggregate-join rollup
``lineitem_daily_nation`` stores the customer-nation FK it joined at
materialization time, and chain REBASING (model/request_model.py) lets
the nation/region dim chain re-enter at that stored key — skipping the
orders and customer joins entirely. Pins:

1. q5 (region revenue through the 4-dim snowflake chain) is served from
   the rollup, bit-identical to the raw join+aggregate plan;
2. requests touching a SKIPPED dim's attributes fall back to the raw
   fact — EXCEPT attributes the rollup MATERIALIZES
   (``DimCol.materializes``: customer.c_mktsegment is stored on the
   rollup), which serve from the stored column with no customer join
   (the q4 shape); customer attrs the rollup does NOT store (acctbal)
   and orders attrs still fall back;
3. a request needing a column the rollup discarded (exact order
   distinct) falls back by coverage;
4. queryType=scan never hits the pre-aggregated table;
5. when both lineitem_daily (cost 50) and lineitem_daily_nation (60)
   are materialized, a chain-free summable request picks the cheaper
   daily rollup — the join-aware table wins only requests that need it.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.engine import engine_for_dir  # noqa: E402
from maha_spark.examples.contract import (  # noqa: E402
    build_contract_registry, materialize_lineitem_nation_rollup,
    materialize_lineitem_rollup,
)

SRC = "/root/testdata/sf0.001"
DAY_ALL = {"field": "day", "operator": "between",
           "from": "1995-01-01", "to": "2002-12-31"}
Q5 = {
    "cube": "tpch",
    "selectFields": [{"field": "region_name"}, {"field": "revenue"},
                     {"field": "sum_qty"}],
    "filterExpressions": [DAY_ALL],
}


@pytest.fixture(scope="module")
def nat_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("natroll"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    materialize_lineitem_nation_rollup(spark, SRC, d)
    return d


@pytest.fixture(scope="module")
def raw_eng(spark):
    return engine_for_dir(spark, build_contract_registry(), SRC)


@pytest.fixture(scope="module")
def nat_eng(spark, nat_dir):
    return engine_for_dir(spark, build_contract_registry(), nat_dir)


def _rows(eng, req):
    return sorted(map(tuple, eng.dataframe(req).collect()))


def test_q5_served_from_nation_rollup_exactly(raw_eng, nat_eng):
    assert raw_eng.model(Q5).fact_table.name == "lineitem"
    m = nat_eng.model(Q5)
    assert m.fact_table.name == "lineitem_daily_nation"
    # the rebased chain enters at customer_nation and keeps region
    chain_dims = [d.name for ch in m.chains for d in ch.dims]
    assert chain_dims == ["customer_nation", "customer_region"]
    assert m.chains[0].fact_fk_col == "cust_nation_fk"
    a = _rows(raw_eng, Q5)
    b = _rows(nat_eng, Q5)
    assert a == b and len(a) > 0


def test_nation_grouping_and_filter_served(raw_eng, nat_eng):
    req = {
        "cube": "tpch",
        "selectFields": [{"field": "nation_name"}, {"field": "revenue"},
                         {"field": "line_count"}],
        "filterExpressions": [
            DAY_ALL,
            {"field": "region_name", "operator": "in",
             "values": ["ASIA", "EUROPE", "AMERICA"]}],
    }
    assert nat_eng.model(req).fact_table.name == "lineitem_daily_nation"
    assert _rows(raw_eng, req) == _rows(nat_eng, req)
    assert len(_rows(nat_eng, req)) > 0


def test_materialized_segment_filter_served_from_rollup(raw_eng, nat_eng):
    """The q4 shape: a filter on customer.mktsegment — BEFORE the rebase
    entry point, but MATERIALIZED on the rollup — is rewritten onto the
    stored column; the chain joins only customer_nation."""
    q4 = {
        "cube": "tpch",
        "selectFields": [{"field": "nation_name"}, {"field": "revenue"},
                         {"field": "line_count"}],
        "filterExpressions": [DAY_ALL,
                              {"field": "mktsegment", "operator": "=",
                               "value": "BUILDING"}],
    }
    m = nat_eng.model(q4)
    assert m.fact_table.name == "lineitem_daily_nation"
    assert m.covered_dim_aliases == {"mktsegment": "c_mktsegment"}
    assert [d.name for ch in m.chains for d in ch.dims] == ["customer_nation"]
    a = _rows(raw_eng, q4)
    assert a == _rows(nat_eng, q4) and len(a) > 0


def test_materialized_segment_grouping_served_from_rollup(raw_eng, nat_eng):
    req = {
        "cube": "tpch",
        "selectFields": [{"field": "mktsegment"}, {"field": "nation_name"},
                         {"field": "revenue"}],
        "filterExpressions": [DAY_ALL],
    }
    m = nat_eng.model(req)
    assert m.fact_table.name == "lineitem_daily_nation"
    a = _rows(raw_eng, req)
    assert a == _rows(nat_eng, req) and len(a) > 0


def test_fully_covered_chain_joins_nothing(raw_eng, nat_eng):
    """Every used dim attribute materialized -> the chain drops off the
    plan entirely: no dim join at all, just a fact filter."""
    req = {
        "cube": "tpch",
        "selectFields": [{"field": "day"}, {"field": "revenue"}],
        "filterExpressions": [
            {"field": "day", "operator": "between",
             "from": "1996-01-01", "to": "1996-03-31"},
            {"field": "mktsegment", "operator": "in",
             "values": ["BUILDING", "AUTOMOBILE"]}],
    }
    m = nat_eng.model(req)
    assert m.fact_table.name == "lineitem_daily_nation"
    assert m.chains == []
    a = _rows(raw_eng, req)
    assert a == _rows(nat_eng, req) and len(a) > 0


def test_dim_driven_requests_never_use_coverage(raw_eng, nat_eng):
    """Dim-driven: the mktsegment filter must select ENTITIES (zero-fact
    customers included) — a fact-side rewrite cannot express that, so
    the raw fact serves."""
    req = {
        "cube": "tpch",
        "selectFields": [{"field": "customer_id"}, {"field": "revenue"}],
        "filterExpressions": [DAY_ALL,
                              {"field": "customer_id", "operator": "in",
                               "values": ["1", "2", "3"]},
                              {"field": "mktsegment", "operator": "<>",
                               "value": "BUILDING"}],
        "forceDimensionDriven": True,
        "rowsPerPage": 10,
    }
    assert nat_eng.model(req).fact_table.name == "lineitem"


def test_dim_only_distinct_never_uses_coverage(raw_eng, nat_eng):
    """Dim-only SELECT DISTINCT projects chain attributes, not fact
    dims — coverage is disabled there (the rewrite would drop the
    flipped column from the distinct projection)."""
    req = {
        "cube": "tpch",
        "selectFields": [{"field": "mktsegment"},
                         {"field": "nation_name"}],
        "filterExpressions": [DAY_ALL],
    }
    m = nat_eng.model(req)
    assert m.is_dim_only and m.covered_dim_aliases == {}
    a = _rows(raw_eng, req)
    assert a == _rows(nat_eng, req) and len(a) > 0


def test_skipped_dim_attributes_fall_back_to_raw(raw_eng, nat_eng):
    # customer attribute the rollup does NOT materialize (acctbal)
    q4ish = {
        "cube": "tpch",
        "selectFields": [{"field": "nation_name"}, {"field": "revenue"}],
        "filterExpressions": [DAY_ALL,
                              {"field": "acctbal", "operator": ">",
                               "value": 0}],
    }
    assert nat_eng.model(q4ish).fact_table.name == "lineitem"
    assert _rows(raw_eng, q4ish) == _rows(nat_eng, q4ish)
    # orders attribute likewise
    oreq = {
        "cube": "tpch",
        "selectFields": [{"field": "order_priority"}, {"field": "revenue"}],
        "filterExpressions": [DAY_ALL],
    }
    assert nat_eng.model(oreq).fact_table.name == "lineitem"


def test_discarded_column_falls_back_by_coverage(nat_eng):
    req = {
        "cube": "tpch",
        "selectFields": [{"field": "region_name"},
                         {"field": "order_count"}],
        "filterExpressions": [DAY_ALL],
    }
    assert nat_eng.model(req).fact_table.name == "lineitem"


def test_scan_never_served_from_nation_rollup(nat_eng):
    req = {
        "cube": "tpch", "queryType": "scan",
        "selectFields": [{"field": "region_name"}, {"field": "revenue"}],
        "filterExpressions": [DAY_ALL],
    }
    assert nat_eng.model(req).fact_table.name == "lineitem"


def test_cheaper_rollup_wins_chain_free_requests(spark, tmp_path_factory,
                                                 raw_eng):
    d = str(tmp_path_factory.mktemp("bothroll"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    materialize_lineitem_rollup(spark, SRC, d)
    materialize_lineitem_nation_rollup(spark, SRC, d)
    eng = engine_for_dir(spark, build_contract_registry(), d)
    day_only = {
        "cube": "tpch",
        "selectFields": [{"field": "day"}, {"field": "revenue"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "1995-01-01", "to": "1995-03-31"}],
    }
    assert eng.model(day_only).fact_table.name == "lineitem_daily"
    assert eng.model(Q5).fact_table.name == "lineitem_daily_nation"
    assert _rows(raw_eng, day_only) == _rows(eng, day_only)

def test_rollup_only_cube_reports_one_accurate_chain_error(spark, nat_dir):
    """A cube whose only table is the aggregate-join rollup, given a
    request touching a dim the rollup cannot reach: a clean, ACCURATE
    ValidationError — reachability is scoped to the base table's FKs, so
    the unreachable customer attribute reports as field-not-found, and
    the misleading generic "covers columns" error never appears
    (coverage was not the problem)."""
    from maha_spark.request.request import ValidationError

    reg = build_contract_registry()
    cube = reg.fact("tpch")
    nat_only = [t for t in cube.tables if t.name == "lineitem_daily_nation"]
    assert nat_only
    cube.tables = nat_only
    eng = engine_for_dir(spark, reg, nat_dir)
    req = {
        "cube": "tpch",
        "selectFields": [{"field": "mktsegment"}, {"field": "revenue"}],
        "filterExpressions": [DAY_ALL],
    }
    with pytest.raises(ValidationError) as ei:
        eng.model(req)
    msgs = ei.value.errors
    assert msgs and any("mktsegment" in m for m in msgs), msgs
    assert not any("covers columns" in m for m in msgs), msgs


def test_isnull_filter_on_materialized_attr_falls_back(raw_eng, nat_eng):
    """ADVICE r7: isnull is the one operator the orphan-FK NULL the
    build-time left join stores actually SATISFIES — covering it on the
    rollup would keep orphan fact rows the raw path's inner customer
    join drops. The cover is refused; the raw fact serves."""
    req = {
        "cube": "tpch",
        "selectFields": [{"field": "nation_name"}, {"field": "revenue"}],
        "filterExpressions": [
            DAY_ALL, {"field": "mktsegment", "operator": "isnull"}],
    }
    assert nat_eng.model(req).fact_table.name == "lineitem"
    assert _rows(raw_eng, req) == _rows(nat_eng, req)
    # isnotnull stays covered: NULL never satisfies it, so covered and
    # raw semantics agree (both drop orphan rows)
    req2 = {
        "cube": "tpch",
        "selectFields": [{"field": "nation_name"}, {"field": "revenue"}],
        "filterExpressions": [
            DAY_ALL, {"field": "mktsegment", "operator": "isnotnull"}],
    }
    assert nat_eng.model(req2).fact_table.name == "lineitem_daily_nation"
    assert _rows(raw_eng, req2) == _rows(nat_eng, req2)
