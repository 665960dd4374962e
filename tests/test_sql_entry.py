"""SQL entry point: SQL over public cube aliases == the equivalent JSON
request (MahaCalciteSqlParser parity surface)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.request.sql import (  # noqa: E402
    SqlParseError, sql_to_request_json,
)


def test_sql_translation_shape():
    req = sql_to_request_json("""
        SELECT return_flag, revenue AS rev FROM tpch
        WHERE day BETWEEN '1995-01-01' AND '2002-12-31'
          AND part_type IN ('SMALL', 'MEDIUM')
          AND (brand NOT LIKE 'x' OR part_size > 10)
          AND part_name IS NOT NULL
        ORDER BY revenue DESC LIMIT 7 OFFSET 3
    """)
    assert req["cube"] == "tpch"
    assert req["selectFields"] == [{"field": "return_flag"},
                                   {"field": "revenue", "alias": "rev"}]
    ops = [f.get("operator") for f in req["filterExpressions"]]
    assert ops == ["between", "in", "or", "isnotnull"]
    assert req["sortBy"] == [{"field": "revenue", "order": "DESC"}]
    assert req["rowsPerPage"] == 7
    assert req["paginationStartIndex"] == 3


def test_sql_quoted_aliases_and_distinct():
    req = sql_to_request_json(
        'SELECT DISTINCT "order_status", `order_priority` FROM tpch '
        "WHERE day BETWEEN '1995-01-01' AND '2002-12-31'")
    assert req["distinct"] is True
    assert req["selectFields"][0]["field"] == "order_status"


def test_sql_errors():
    with pytest.raises(SqlParseError):
        sql_to_request_json("SELECT FROM tpch")
    with pytest.raises(SqlParseError):
        sql_to_request_json("SELECT a FROM t WHERE a HAVING b")
    with pytest.raises(SqlParseError):
        sql_to_request_json("SELECT * FROM tpch")  # needs field list


@pytest.fixture(scope="module")
def contract_engine(spark):
    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.contract import build_contract_registry
    return engine_for_dir(spark, build_contract_registry(),
                          "/root/testdata/sf0.001")


def test_sql_equals_json_request(contract_engine):
    sql_df = contract_engine.sql("""
        SELECT return_flag, line_status, revenue FROM tpch
        WHERE day BETWEEN '1995-01-01' AND '2002-12-31'
        ORDER BY revenue DESC LIMIT 4
    """)
    json_df = contract_engine.dataframe({
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}, {"field": "line_status"},
                         {"field": "revenue"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "1995-01-01", "to": "2002-12-31"}],
        "sortBy": [{"field": "revenue", "order": "DESC"}],
        "rowsPerPage": 4,
    })
    assert sql_df.collect() == json_df.collect()


def test_sql_having_maps_to_metric_filter(contract_engine):
    """HAVING on a metric alias produces the q11 result (metric filters
    classify into the aggregate path; SQL == JSON request)."""
    sql_df = contract_engine.sql("""
        SELECT part_id, revenue FROM tpch
        WHERE day BETWEEN '1995-01-01' AND '2002-12-31'
        GROUP BY part_id
        HAVING revenue > 900000
    """)
    json_df = contract_engine.dataframe({
        "cube": "tpch",
        "selectFields": [{"field": "part_id"}, {"field": "revenue"}],
        "filterExpressions": [
            {"field": "day", "operator": "between",
             "from": "1995-01-01", "to": "2002-12-31"},
            {"field": "revenue", "operator": ">", "value": 900000}],
    })
    assert sorted(map(tuple, sql_df.collect())) == \
        sorted(map(tuple, json_df.collect()))
    assert len(sql_df.collect()) > 0


def test_sql_select_star_describe(contract_engine):
    """SELECT * FROM cube LIMIT 0 serves the schema (describe query)."""
    df = contract_engine.sql(
        "SELECT * FROM tpch WHERE day BETWEEN '1995-01-01' "
        "AND '2002-12-31' LIMIT 0")
    cols = set(df.columns)
    assert {"day", "return_flag", "revenue", "line_count"} <= cols
    assert df.count() == 0
