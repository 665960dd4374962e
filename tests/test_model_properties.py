"""Property-based request-model tests (hypothesis): any well-formed
request over the contract cube either builds a model whose projections
mirror the request, or fails validation with accumulated errors — never
an unhandled exception. Pure model layer: no SparkSession."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from maha_spark.examples.contract import build_contract_registry
from maha_spark.model.request_model import build_request_model
from maha_spark.request.request import ValidationError, parse_request

REG = build_contract_registry()
CUBE = REG.fact("tpch")
DAY = {"field": "day", "operator": "between",
       "from": "1995-01-01", "to": "2002-12-31"}

DIM_ALIASES = sorted(p.alias for p in CUBE.pub_cols)
METRIC_ALIASES = sorted(p.alias for p in CUBE.pub_fact_cols)
DIM_ATTRS = sorted({p.alias for d in REG._dims.values() for p in d.pub_cols})
ALL_FIELDS = sorted(set(DIM_ALIASES + METRIC_ALIASES + DIM_ATTRS))

_ops = st.sampled_from(["=", "<>", ">", "<", "like", "in", "isnull"])


def _filter(field: str, op: str) -> dict:
    if op == "in":
        return {"field": field, "operator": "in", "values": ["1", "2"]}
    if op == "isnull":
        return {"field": field, "operator": "isnull"}
    return {"field": field, "operator": op, "value": "1"}


@settings(max_examples=120, deadline=None)
@given(fields=st.lists(st.sampled_from(ALL_FIELDS), min_size=1,
                       max_size=6, unique=True))
def test_any_field_combination_builds_or_validates(fields):
    req = parse_request({"cube": "tpch",
                         "selectFields": [{"field": f} for f in fields],
                         "filterExpressions": [DAY]})
    try:
        m = build_request_model(req, REG)
    except ValidationError as e:
        assert e.errors  # failure always carries accumulated messages
        return
    # projections mirror the request 1:1, in order
    assert [p.alias for p in m.projections] == fields
    # every chain the model plans is reachable from the fact's FKs
    for ch in m.chains:
        assert ch.fact_fk_col in m.fact_table.columns


@settings(max_examples=120, deadline=None)
@given(field=st.sampled_from(ALL_FIELDS), op=_ops)
def test_any_single_filter_builds_or_validates(field, op):
    req = parse_request({
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}, {"field": "revenue"}],
        "filterExpressions": [DAY, _filter(field, op)]})
    try:
        m = build_request_model(req, REG)
    except ValidationError as e:
        assert e.errors
        return
    # accepted filters land somewhere concrete: fact side, a dim chain,
    # or the outer/post-join bucket
    placed = (len(m.fact_filters) + len(m.outer_filters)
              + sum(len(fs) for ch in m.chains
                    for fs in ch.filters.values()))
    assert placed >= 2  # day filter + the generated one


@settings(max_examples=60, deadline=None)
@given(si=st.integers(min_value=0, max_value=10_000),
       mr=st.integers(min_value=-1, max_value=6_000))
def test_pagination_bounds_always_validated(si, mr):
    req = {"cube": "tpch",
           "selectFields": [{"field": "return_flag"},
                            {"field": "revenue"}],
           "filterExpressions": [DAY],
           "paginationStartIndex": si, "rowsPerPage": mr}
    try:
        m = build_request_model(parse_request(req), REG)
    except ValidationError as e:
        assert mr > 5000 and any("cap" in x for x in e.errors)
        return
    assert m.start_index == si
    assert m.max_rows == mr
