"""Validation surfaces that were declared-but-unenforced in round 1:
dependsOnColumns (RequestModel.scala:453) and per-schema dim row security
via schemaColMap (dimension/Dimension.scala:607,1113) — RequestModelTest-
style negative cases."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.request.request import ValidationError  # noqa: E402

DAY = {"field": "Day", "operator": "between",
       "from": "1995-01-01", "to": "2002-12-31"}
DAY_C = {"field": "day", "operator": "between",
         "from": "1995-01-01", "to": "2002-12-31"}


@pytest.fixture(scope="module")
def contract_engine(spark):
    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.contract import build_contract_registry
    return engine_for_dir(spark, build_contract_registry(),
                          "/root/testdata/sf0.001")


def test_depends_on_columns_missing_fails(engine):
    req = {
        "cube": "lineitem_stats",
        "selectFields": [{"field": "Brand"}, {"field": "Revenue"}],
        "filterExpressions": [DAY],
    }
    with pytest.raises(ValidationError, match="Missing dependent column"):
        engine.dataframe(req)


def test_depends_on_columns_satisfied_by_filter(engine):
    req = {
        "cube": "lineitem_stats",
        "selectFields": [{"field": "Brand"}, {"field": "Revenue"}],
        "filterExpressions": [DAY, {"field": "Part Type", "operator": "in",
                                    "values": ["SMALL", "MEDIUM"]}],
    }
    assert engine.dataframe(req).columns == ["Brand", "Revenue"]


def test_depends_on_columns_satisfied_by_projection(engine):
    req = {
        "cube": "lineitem_stats",
        "selectFields": [{"field": "Brand"}, {"field": "Part Type"},
                         {"field": "Revenue"}],
        "filterExpressions": [DAY],
    }
    assert engine.dataframe(req) is not None


def test_schema_col_map_requires_dim_filter(contract_engine):
    """The tpch_union cube has NO cube-level schema_required_alias, so the
    dim-level schemaColMap on customer is what must fire: querying through
    the customer dim with schema='customer' and no customer_id filter is
    rejected."""
    req = {
        "cube": "tpch_union",
        "selectFields": [{"field": "nation_name"}, {"field": "revenue"}],
        "filterExpressions": [DAY_C],
    }
    with pytest.raises(ValidationError,
                       match="requires a filter on 'customer_id'"):
        contract_engine.dataframe(req, schema="customer")
    # same request under the unrestricted internal schema is fine
    assert contract_engine.dataframe(req, schema="internal") is not None


def test_schema_col_map_satisfied(contract_engine):
    req = {
        "cube": "tpch_union",
        "selectFields": [{"field": "nation_name"}, {"field": "revenue"}],
        "filterExpressions": [DAY_C, {"field": "customer_id",
                                      "operator": "=", "value": 1}],
    }
    df = contract_engine.dataframe(req, schema="customer")
    assert df.columns == ["nation_name", "revenue"]
