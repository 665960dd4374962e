"""Aggregate-awareness: cheapest covering fact table wins
(reference DefaultQueryPipelineFactory.findBestFactCandidate,
QueryPipeline.scala:487-561 — candidates pruned by column coverage, then
ordered by cost)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.examples.contract import build_contract_registry  # noqa: E402
from maha_spark.model.request_model import build_request_model  # noqa: E402
from maha_spark.request.request import parse_request  # noqa: E402

REG = build_contract_registry()
DAY = {"field": "day", "operator": "between",
       "from": "1995-01-01", "to": "2002-12-31"}


def _model(select, filters=None):
    return build_request_model(parse_request({
        "cube": "tpch",
        "selectFields": [{"field": f} for f in select],
        "filterExpressions": [DAY] + (filters or [])}), REG)


def test_cheap_rollup_chosen_when_columns_covered():
    # return_flag + revenue: fully summable -> the cost-50 pre-aggregated
    # daily rollup wins over both row-grain tables
    m = _model(["return_flag", "revenue"])
    assert m.fact_table.cost == 50
    # the exact order distinct at a coarser-than-stored grain disqualifies
    # the daily rollup (serves_grain) -> next-cheapest: the cost-2000
    # narrow copy (without l_partkey/l_suppkey/l_linenumber)
    m2 = _model(["return_flag", "order_count"])
    assert m2.fact_table.cost == 2000


def test_base_table_forced_by_discarded_projection():
    # line_number is discarded from the rollup -> base table (cost 6000)
    m = _model(["line_number", "revenue"])
    assert m.fact_table.cost == 6000


def test_base_table_forced_by_discarded_fk_join():
    # joining the supplier dimension needs the l_suppkey FK, which EVERY
    # rollup discards -> base table. (The part chain no longer forces
    # the base: lineitem_daily_part keeps l_partkey precisely so
    # part-attribute requests serve from its (day, part) partials —
    # brand is functionally determined by the part key, so grouping the
    # partials by the joined attribute is lossless.)
    m = _model(["supplier_name", "revenue"])
    assert m.fact_table.cost == 6000
    m2 = _model(["brand", "revenue"])
    assert m2.fact_table.name == "lineitem_daily_part"
    assert m2.fact_table.cost == 400


def test_base_table_forced_by_filter_dependency():
    # a filter on a discarded column forces the base table even when the
    # projection alone would fit the rollup
    m = _model(["return_flag", "revenue"],
               [{"field": "line_number", "operator": ">", "value": 3}])
    assert m.fact_table.cost == 6000


def test_available_onwards_disqualifies_rollup_for_old_windows():
    """availableOnwardsDate (fact/Fact.scala getCandidatesFor:1752): a
    rollup backfilled from 1998 cannot serve a window starting in 1995;
    a window entirely after the backfill date can use it."""
    import copy
    reg = build_contract_registry()
    fact = reg.fact("tpch")
    fact = copy.deepcopy(fact)
    for t in fact.tables:
        if t.cost in (2000, 50):  # both rollup tiers backfilled from 1998
            t.available_onwards = "1998-01-01"
    reg.register_fact(fact)

    def model(day_from, day_to):
        return build_request_model(parse_request({
            "cube": "tpch",
            "selectFields": [{"field": "return_flag"},
                             {"field": "revenue"}],
            "filterExpressions": [
                {"field": "day", "operator": "between",
                 "from": day_from, "to": day_to}]}), reg)

    # window starts before the rollups' data exists -> base table
    assert model("1995-01-01", "2002-12-31").fact_table.cost == 6000
    # window fully inside the rollups' availability -> cheapest rollup
    assert model("1998-06-01", "1999-06-01").fact_table.cost == 50


def test_cost_multiplier_prefers_async_tuned_copy():
    """costMultiplierMap (fact/Fact.scala:451): the same two candidates
    order differently per request type when a copy advertises an async
    discount."""
    from maha_spark.examples.contract import build_contract_registry

    reg = build_contract_registry()
    cube = reg.fact("tpch")
    base = next(t for t in cube.tables if t.cost == 6000)
    rollup = next(t for t in cube.tables if t.cost == 2000)
    daily = next(t for t in cube.tables if t.cost == 50)
    # async reports prefer the base table (e.g. it lives on cheaper
    # storage tuned for large scans)
    base.cost_multiplier_map = {"AsyncRequest": 0.1}
    rollup.cost_multiplier_map = {"AsyncRequest": 2.0}
    daily.cost_multiplier_map = {"AsyncRequest": 1000.0}

    from maha_spark.model.request_model import build_request_model
    from maha_spark.request.request import parse_request

    def model(request_type):
        return build_request_model(parse_request({
            "cube": "tpch",
            "requestType": request_type,
            "selectFields": [{"field": "return_flag"},
                             {"field": "revenue"}],
            "filterExpressions": [DAY]}), reg)

    assert model("SyncRequest").fact_table.cost == 50     # unchanged
    assert model("AsyncRequest").fact_table.cost == 6000  # 600 < 4000 < 50k


def test_schema_restricted_table_excluded():
    """FactTable.schemas (Fact.scala getCandidatesFor): a table declared
    for specific schemas only serves requests under them."""
    from maha_spark.examples.contract import build_contract_registry
    from maha_spark.model.request_model import build_request_model
    from maha_spark.request.request import parse_request

    reg = build_contract_registry()
    cube = reg.fact("tpch")
    for t in cube.tables:
        if t.cost in (2000, 50):  # both rollup tiers partner-only
            t.schemas = {"partner"}

    def model(schema):
        return build_request_model(parse_request({
            "cube": "tpch",
            "selectFields": [{"field": "return_flag"},
                             {"field": "revenue"}],
            "filterExpressions": [DAY]}, schema=schema), reg)

    # internal requests cannot use the partner-only rollups
    assert model("internal").fact_table.cost == 6000
    assert model("partner").fact_table.cost == 50
