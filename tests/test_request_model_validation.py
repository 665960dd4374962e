"""RequestModelTest-style validation breadth
(reference core/src/test/.../RequestModelTest.scala: ~140 cases over
required fields, filter ops, day windows, schema access, caps).

Pure model-layer tests: build_request_model needs only the registry, no
SparkSession, so every negative path is exercised cheaply."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.core.columns import DerivedDimCol, DimCol, FactCol  # noqa: E402
from maha_spark.core.filters import (  # noqa: E402
    BetweenFilter, EqualityFilter, IN_BETWEEN_EQUALITY,
)
from maha_spark.core.grain import DAILY  # noqa: E402
from maha_spark.core.types import (  # noqa: E402
    DateType, IntType, StaticMapping, StrType,
)
from maha_spark.model.request_model import build_request_model  # noqa: E402
from maha_spark.registry.cube import (  # noqa: E402
    DimensionTable, FactTable, PubCol, PublicDimension, PublicFact, Registry,
)
from maha_spark.request.request import (  # noqa: E402
    ValidationError, parse_request,
)

TODAY = dt.date(2001, 6, 1)


def make_registry() -> Registry:
    """Fixture cube exercising every validation attribute
    (RequestModelTest.scala fixture style: one cube, many annotations)."""
    reg = Registry()
    adv = DimensionTable(
        name="advertiser", primary_key="a_id", level=1,
        schema_col_map={"advertiser": "a_id"},
        columns={"a_id": DimCol("a_id", IntType()),
                 "a_name": DimCol("a_name", StrType())})
    reg.register_dimension(PublicDimension(
        name="advertiser", table=adv,
        pub_cols=[PubCol("Advertiser ID", "a_id"),
                  PubCol("Advertiser Name", "a_name")]))

    cols = {
        "day_col": DimCol("day_col", DateType(), is_day_column=True),
        "stats_day": DerivedDimCol("stats_day", DateType(),
                                   expr="CAST({day_col} AS DATE)"),
        "advertiser_id": DimCol("advertiser_id", IntType(),
                                foreign_key="advertiser"),
        "campaign_id": DimCol("campaign_id", IntType()),
        "device": DimCol("device", StrType()),
        "secret_col": DimCol("secret_col", StrType()),
        # bounded varchar (DataType.scala StrType(length)): filter values
        # longer than the column are a validation error
        "tag": DimCol("tag", StrType(length=5)),
        # statically mapped enum (DataType.scala:43-64): only =/<>/in/not
        # in make sense against labels
        "pricing": DimCol("pricing", IntType(static_mapping=StaticMapping(
            {1: "CPC", 2: "CPM"}, "NONE"))),
        "imps": FactCol("imps", IntType()),
        "clicks": FactCol("clicks", IntType()),
    }
    fact = FactTable(name="stats", columns=cols, grain=DAILY, cost=100)
    reg.register_fact(PublicFact(
        name="perf",
        tables=[fact],
        pub_cols=[
            PubCol("Day", "stats_day", IN_BETWEEN_EQUALITY),
            PubCol("Advertiser ID", "advertiser_id",
                   filtering_required=True),
            PubCol("Campaign ID", "campaign_id"),
            # Device only valid with Campaign ID present (dependsOnColumns)
            PubCol("Device", "device",
                   depends_on_columns=frozenset({"Campaign ID"})),
            # internal-only column (restrictedSchemas, Column.scala:13-24)
            PubCol("Secret", "secret_col",
                   restricted_schemas=frozenset({"internal"})),
            PubCol("Tag", "tag"),
            PubCol("Pricing Type", "pricing"),
        ],
        pub_fact_cols=[
            PubCol("Impressions", "imps"),
            # Clicks may not be requested together with Secret
            PubCol("Clicks", "clicks",
                   incompatible_columns=frozenset({"Secret"})),
        ],
        schema_required_alias={"advertiser": "Advertiser ID"},
        max_days_window=31,
        max_days_lookback=400,
        day_alias="Day",
    ))
    return reg


REG = make_registry()
DAY = {"field": "Day", "operator": "between",
       "from": "2001-05-01", "to": "2001-05-30"}
ADV = {"field": "Advertiser ID", "operator": "=", "value": 1}


def build(select, filters, schema="internal", **extra):
    req = parse_request({
        "cube": "perf",
        "selectFields": [{"field": f} for f in select],
        "filterExpressions": filters,
        **extra,
    }, schema=schema)
    return build_request_model(req, REG, today=TODAY)


def errs(select, filters, schema="internal", **extra) -> str:
    with pytest.raises(ValidationError) as ei:
        build(select, filters, schema=schema, **extra)
    return " ".join(ei.value.errors)


# ------------------------------------------------------------ happy path
def test_valid_request_builds():
    m = build(["Day", "Impressions"], [DAY, ADV])
    assert [p.alias for p in m.projections] == ["Day", "Impressions"]


# ------------------------------------------------------- field resolution
def test_unknown_cube():
    req = parse_request({"cube": "nope", "selectFields": [{"field": "Day"}],
                         "filterExpressions": [DAY]})
    with pytest.raises((ValidationError, KeyError)):
        build_request_model(req, REG, today=TODAY)


def test_unknown_select_field():
    assert "Field not found" in errs(["Bogus", "Impressions"], [DAY, ADV])


def test_unknown_filter_field():
    assert "Filter field not found" in errs(
        ["Impressions"], [DAY, ADV,
                          {"field": "Bogus", "operator": "=", "value": 1}])


def test_unknown_sort_field():
    # an unknown sort field is also unselected, so the ordering-fields
    # rule rejects it before cube resolution is even attempted
    assert "Ordering field must be in requested fields" in errs(
        ["Impressions"], [DAY, ADV],
        sortBy=[{"field": "Bogus", "order": "ASC"}])


# ------------------------------------------------------------ day window
def test_missing_day_filter():
    assert "Day filter missing" in errs(["Impressions"], [ADV])


def test_day_from_after_to():
    assert "'from' must be <= 'to'" in errs(
        ["Impressions"],
        [{"field": "Day", "operator": "between",
          "from": "2001-05-30", "to": "2001-05-01"}, ADV])


def test_max_days_window_exceeded():
    assert "Max days window exceeded" in errs(
        ["Impressions"],
        [{"field": "Day", "operator": "between",
          "from": "2001-01-01", "to": "2001-05-30"}, ADV])


def test_max_days_lookback_exceeded():
    assert "look back exceeded" in errs(
        ["Impressions"],
        [{"field": "Day", "operator": "between",
          "from": "2000-01-01", "to": "2000-01-20"}, ADV])


def test_lookback_boundary_ok():
    m = build(["Impressions"],
              [{"field": "Day", "operator": "between",
                "from": "2000-06-01", "to": "2000-06-20"}, ADV])
    assert m.day_range == (dt.date(2000, 6, 1), dt.date(2000, 6, 20))


# ----------------------------------------------------- filter operations
def test_disallowed_op_on_day():
    assert "Unsupported operation" in errs(
        ["Impressions"],
        [DAY, ADV, {"field": "Day", "operator": "like", "value": "2001"}])


def test_in_list_cap():
    from maha_spark.model.request_model import MAX_ALLOWED_FILTER_VALUES
    vals = list(range(MAX_ALLOWED_FILTER_VALUES + 1))
    assert "max allowed values" in errs(
        ["Impressions"],
        [DAY, ADV, {"field": "Campaign ID", "operator": "in", "values": vals}])


def test_disallowed_op_inside_or_combinator():
    assert "Unsupported operation" in errs(
        ["Impressions"],
        [DAY, ADV, {"operator": "or", "filterExpressions": [
            {"field": "Day", "operator": "like", "value": "x"},
            {"field": "Campaign ID", "operator": "=", "value": 1}]}])


# --------------------------------------------------- schema access control
def test_schema_required_filter_missing():
    assert "required filter for schema" in errs(
        ["Impressions"], [DAY], schema="advertiser")


def test_schema_required_filter_present():
    m = build(["Impressions"], [DAY, ADV], schema="advertiser")
    assert m.cube.name == "perf"


def test_restricted_schema_blocks_field():
    assert "restricted to schemas" in errs(
        ["Secret", "Impressions"], [DAY, ADV], schema="advertiser")


def test_restricted_schema_allows_listed():
    m = build(["Secret", "Campaign ID", "Impressions"], [DAY, ADV],
              schema="internal")
    assert "Secret" in [p.alias for p in m.projections]


# -------------------------------------------- column compatibility rules
def test_incompatible_columns():
    assert "incompatible with" in errs(
        ["Secret", "Clicks"], [DAY, ADV])


def test_depends_on_columns_missing():
    assert "Missing dependent column" in errs(
        ["Device", "Impressions"], [DAY, ADV])


def test_depends_on_columns_via_filter():
    m = build(["Device", "Impressions"],
              [DAY, ADV, {"field": "Campaign ID", "operator": "=", "value": 3}])
    assert "Device" in [p.alias for p in m.projections]


def test_filtering_required_enforced():
    assert "filtering is required" in errs(["Impressions"], [DAY])


# ------------------------------------------------------------- row caps
def test_sync_rows_cap():
    assert "exceeds cap" in errs(["Impressions"], [DAY, ADV],
                                 rowsPerPage=5001)


def test_async_rows_cap_allows_more():
    m = build(["Impressions"], [DAY, ADV], rowsPerPage=50000,
              requestType="AsyncRequest")
    assert m.max_rows == 50000


def test_async_rows_cap_limit():
    assert "exceeds cap" in errs(["Impressions"], [DAY, ADV],
                                 rowsPerPage=100001,
                                 requestType="AsyncRequest")


# ----------------------------------------------------- errors accumulate
def test_sort_field_must_be_selected():
    # a known metric that is NOT in selectFields is still rejected
    # (reference: ordering fields must be among requested fields)
    assert "Ordering field must be in requested fields" in errs(
        ["Impressions"], [DAY, ADV],
        sortBy=[{"field": "Clicks", "order": "DESC"}])


def test_unknown_revision_is_validation_error():
    req = parse_request({
        "cube": "perf",
        "selectFields": [{"field": "Impressions"}],
        "filterExpressions": [DAY, ADV]})
    with pytest.raises(ValidationError, match="revision"):
        build_request_model(req, REG, today=TODAY, revision=99)


def test_datetimebetween_requires_iso8601():
    with pytest.raises(ValueError, match="ISO-8601"):
        parse_request({
            "cube": "perf",
            "selectFields": [{"field": "Impressions"}],
            "filterExpressions": [
                DAY,
                {"field": "Day", "operator": "datetimebetween",
                 "from": "not-a-date", "to": "2020"}]})


def test_errors_accumulate_not_fail_fast():
    msgs = errs(["Bogus", "Device"], [])
    assert "Field not found" in msgs
    assert "Day filter missing" in msgs
    assert "Missing dependent column" in msgs
    assert "filtering is required" in msgs


# ---------------------------------------------- round-3 breadth additions
def test_duplicate_select_fields():
    msgs = errs(["Impressions", "Impressions"], [DAY, ADV])
    assert "Duplicate fields/aliases" in msgs


def test_duplicate_output_alias_across_fields():
    req = parse_request({
        "cube": "perf",
        "selectFields": [{"field": "Impressions", "alias": "X"},
                         {"field": "Clicks", "alias": "X"}],
        "filterExpressions": [DAY, ADV]})
    with pytest.raises(ValidationError, match="Duplicate"):
        build_request_model(req, REG, today=TODAY)


def test_distinct_aliases_for_same_field_ok():
    req = parse_request({
        "cube": "perf",
        "selectFields": [{"field": "Impressions", "alias": "A"},
                         {"field": "Impressions", "alias": "B"}],
        "filterExpressions": [DAY, ADV]})
    m = build_request_model(req, REG, today=TODAY)
    assert [p.output_name for p in m.projections] == ["A", "B"]


def test_required_field_must_be_requested():
    reg = Registry()
    cols = {
        "day_col": DimCol("day_col", DateType(), is_day_column=True),
        "account": DimCol("account", IntType()),
        "imps": FactCol("imps", IntType()),
    }
    reg.register_fact(PublicFact(
        name="req_cube",
        tables=[FactTable(name="f", columns=cols, grain=DAILY)],
        pub_cols=[PubCol("Day", "day_col", IN_BETWEEN_EQUALITY),
                  PubCol("Account", "account", required=True)],
        pub_fact_cols=[PubCol("Impressions", "imps")],
        day_alias="Day"))
    req = parse_request({
        "cube": "req_cube",
        "selectFields": [{"field": "Impressions"}],
        "filterExpressions": [DAY]})
    with pytest.raises(ValidationError, match="Missing required field"):
        build_request_model(req, reg, today=TODAY)
    ok = parse_request({
        "cube": "req_cube",
        "selectFields": [{"field": "Account"}, {"field": "Impressions"}],
        "filterExpressions": [DAY]})
    build_request_model(ok, reg, today=TODAY)


def test_schema_required_filter_op_must_be_in_or_eq():
    msgs = errs(["Impressions"],
                [DAY, {"field": "Advertiser ID", "operator": ">",
                       "value": "0"}],
                schema="advertiser")
    assert "Invalid schema required filter" in msgs


def test_schema_required_filter_in_op_ok():
    build(["Impressions"],
          [DAY, {"field": "Advertiser ID", "operator": "in",
                 "values": [1, 2]}],
          schema="advertiser")


def test_outer_filter_field_must_be_selected():
    msgs = errs(["Impressions"],
                [DAY, ADV,
                 {"operator": "outer", "outerFilters": [
                     {"field": "Clicks", "operator": ">", "value": "5"}]}])
    assert "OuterFilter" in msgs and "selected column list" in msgs


def test_field_equality_requires_same_type():
    msgs = errs(["Impressions"],
                [DAY, ADV,
                 {"field": "Device", "operator": "==",
                  "compareTo": "Campaign ID"}])
    assert "same data type" in msgs


def test_field_equality_same_type_ok():
    build(["Impressions"],
          [DAY, ADV, {"field": "Campaign ID", "operator": "==",
                      "compareTo": "Advertiser ID"}])


def test_filter_value_exceeds_declared_length():
    msgs = errs(["Impressions"],
                [DAY, ADV, {"field": "Tag", "operator": "=",
                            "value": "toolongvalue"}])
    assert "exceeds max length" in msgs


def test_filter_value_within_length_ok():
    build(["Impressions"],
          [DAY, ADV, {"field": "Tag", "operator": "=", "value": "ok"}])


def test_static_mapped_field_rejects_like():
    msgs = errs(["Impressions"],
                [DAY, ADV, {"field": "Pricing Type", "operator": "like",
                            "value": "CP"}])
    assert "statically mapped" in msgs


def test_static_mapped_field_equality_label_ok():
    build(["Impressions"],
          [DAY, ADV, {"field": "Pricing Type", "operator": "=",
                      "value": "CPC"}])


def test_numeric_field_rejects_non_numeric_value():
    msgs = errs(["Impressions"],
                [DAY, ADV, {"field": "Impressions", "operator": ">",
                            "value": "abc"}])
    assert "Unknown filter value" in msgs


def test_numeric_field_accepts_numeric_string():
    build(["Impressions"],
          [DAY, ADV, {"field": "Impressions", "operator": ">",
                      "value": "100"}])


def test_force_dim_and_fact_conflict():
    with pytest.raises(ValidationError, match="both cannot be true"):
        parse_request({"cube": "perf",
                       "selectFields": [{"field": "Impressions"}],
                       "filterExpressions": [DAY, ADV],
                       "forceDimensionDriven": True,
                       "forceFactDriven": True})


def test_per_request_type_window_caps():
    """Reference getMaxDaysWindow keys the caps by RequestType — a dict
    cap applies per requestType, async typically wider."""
    reg = make_registry()
    reg.fact("perf").max_days_window = {"SyncRequest": 10,
                                        "AsyncRequest": 62}
    from maha_spark.model.request_model import build_request_model

    def build_typed(request_type):
        return build_request_model(parse_request({
            "cube": "perf",
            "requestType": request_type,
            "selectFields": [{"field": "Impressions"}],
            "filterExpressions": [DAY, ADV]}), reg, today=TODAY)

    # DAY spans 30 days: over the 10-day sync cap, under the async one
    with pytest.raises(ValidationError, match="window"):
        build_typed("SyncRequest")
    build_typed("AsyncRequest")


def test_from_date_in_future_fails():
    msgs = errs(["Impressions"],
                [{"field": "Day", "operator": "between",
                  "from": "2001-06-10", "to": "2001-06-20"}, ADV])
    assert "future" in msgs


def test_to_date_in_future_passes_with_past_from():
    build(["Impressions"],
          [{"field": "Day", "operator": "between",
            "from": "2001-05-25", "to": "2001-06-20"}, ADV])


def test_empty_or_combinator_rejected():
    with pytest.raises(ValidationError, match="at least one"):
        parse_request({"cube": "perf",
                       "selectFields": [{"field": "Impressions"}],
                       "filterExpressions": [
                           DAY, ADV,
                           {"operator": "or", "filterExpressions": []}]})


def test_filter_and_sort_order_insensitive():
    """RequestModelTest 'order of filter/sort by should not change
    request model': the analyzed structure is order-independent."""
    f1 = {"field": "Campaign ID", "operator": "=", "value": "5"}
    f2 = {"field": "Impressions", "operator": ">", "value": "10"}
    s1 = {"field": "Campaign ID", "order": "ASC"}
    s2 = {"field": "Impressions", "order": "DESC"}

    def sig(filters, sorts):
        m = build(["Campaign ID", "Impressions"], filters, sortBy=sorts)
        return (sorted(repr(f) for f in m.fact_filters),
                [*(s.field for s in m.fact_sorts)],
                m.fact_table.name)

    a = sig([DAY, ADV, f1, f2], [s1, s2])
    b = sig([f2, f1, ADV, DAY], [s1, s2])
    assert a[0] == b[0] and a[2] == b[2]
    # sort ORDER is user-visible and must be preserved as given
    m1 = build(["Campaign ID", "Impressions"], [DAY, ADV],
               sortBy=[s1, s2])
    m2 = build(["Campaign ID", "Impressions"], [DAY, ADV],
               sortBy=[s2, s1])
    all1 = [s.field for s in (*m1.dim_sorts, *m1.fact_sorts)]
    all2 = [s.field for s in (*m2.dim_sorts, *m2.fact_sorts)]
    assert set(all1) == set(all2)


def test_additional_column_info_non_list_is_400():
    """A non-list AdditionalColumnInfo raises ValidationError (400), not
    TypeError (500)."""
    import pytest
    from maha_spark.examples.contract import build_contract_registry
    from maha_spark.model.request_model import build_request_model
    from maha_spark.request.request import ValidationError, parse_request

    req = parse_request({
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}, {"field": "revenue"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "1995-01-01", "to": "1995-01-31"}],
        "additionalParameters": {"AdditionalColumnInfo": 1},
    })
    with pytest.raises(ValidationError, match="AdditionalColumnInfo"):
        build_request_model(req, build_contract_registry())


def test_stringly_false_booleans_do_not_enable():
    """'false'/'0' through proxies must not flip request booleans."""
    from maha_spark.request.request import parse_request

    req = parse_request({
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}],
        "distinct": "false",
        "includeRowCount": "0",
        "forceDimensionDriven": "False",
        "debug": "true",
    })
    assert not req.is_distinct
    assert not req.include_row_count
    assert not req.force_dimension_driven
    assert req.is_debug


def test_stringly_false_force_flags_not_mutually_exclusive():
    """'false' strings for both force flags must not trigger the
    mutual-exclusion 400 (ReportingRequest.scala:509 checks booleans)."""
    from maha_spark.request.request import parse_request

    req = parse_request({
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}],
        "forceDimensionDriven": "false",
        "forceFactDriven": "0",
    })
    assert not req.force_dimension_driven and not req.force_fact_driven


def test_dim_driven_limit_zero_describe_shape(spark):
    """rowsPerPage=0 is a real limit on dim-driven plans too (describe
    queries serve the schema with zero rows)."""
    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.contract import build_contract_registry

    eng = engine_for_dir(spark, build_contract_registry(),
                         "/root/testdata/sf0.001")
    df = eng.dataframe({
        "cube": "tpch",
        "selectFields": [{"field": "order_priority"}, {"field": "revenue"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "1995-01-01", "to": "2002-12-31"}],
        "forceDimensionDriven": True,
        "rowsPerPage": 0,
    })
    assert df.count() == 0
    assert df.columns == ["order_priority", "revenue"]
