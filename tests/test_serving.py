"""JDBC/Thrift serving surface (MahaAvaticaService parity).

A real wire round-trip: HiveThriftServer2 starts in-process, a JDBC
connection (hive-jdbc driver via py4j) discovers the published cube views
through catalog metadata, describes them, and runs aggregate SQL whose
results must match the engine's own plan for the equivalent request.
"""

from __future__ import annotations

import json

import pytest

from maha_spark.examples.tpch import build_registry
from maha_spark.plans.binding import ParquetBinding
from maha_spark.serving import (
    JdbcClient, ThriftServingServer, publish_registry,
)

PORT = 10931


@pytest.fixture(scope="module")
def serving(spark, sf_dir):
    registry = build_registry()
    binding = ParquetBinding(spark, sf_dir)
    names = publish_registry(spark, registry, binding)
    server = ThriftServingServer(spark, port=PORT).start()
    client = JdbcClient(spark, server.jdbc_url)
    yield client, names
    client.close()
    server.stop()


def test_catalog_discovery(serving):
    client, names = serving
    tables = client.tables()
    assert "lineitem_stats" in tables
    assert "user_events" in tables
    assert "maha_domain" in tables
    cols = dict(client.columns("lineitem_stats"))
    # fact-local aliases, chain-joined dim aliases, and metrics all appear
    assert "Day" in cols
    assert "Return Flag" in cols
    assert "Nation Name" in cols        # lineitem -> orders -> customer -> nation
    assert "Supplier Nation Name" in cols
    assert "Revenue" in cols
    # post-aggregation ratio metrics are intentionally NOT published
    assert "Discount Rate" not in cols


def test_domain_view(serving):
    client, _ = serving
    cols, rows = client.query(
        "SELECT field, type FROM global_temp.maha_domain "
        "WHERE cube = 'lineitem_stats' ORDER BY field")
    fields = {r[0]: r[1] for r in rows}
    assert fields["Revenue"] == "Fact"
    assert fields["Nation Name"] == "Dimension" or "Day" in fields


def test_describe_limit0(serving):
    client, _ = serving
    schema = client.describe(
        "SELECT * FROM global_temp.lineitem_stats LIMIT 0")
    names = [n for n, _ in schema]
    assert "Revenue" in names and "Nation Name" in names
    types = dict(schema)
    assert types["Day"].upper() in ("DATE",)


def test_wire_query_matches_engine(serving, engine):
    client, _ = serving
    cols, rows = client.query(
        'SELECT `Return Flag` AS rf, SUM(`Revenue`) AS revenue, '
        '       SUM(`Total Quantity`) AS qty, SUM(`Line Count`) AS cnt '
        "FROM global_temp.lineitem_stats "
        "WHERE `Day` BETWEEN DATE '1995-03-01' AND DATE '1995-06-30' "
        "GROUP BY `Return Flag` ORDER BY rf")
    assert cols == ["rf", "revenue", "qty", "cnt"]

    expected = engine.dataframe(json.dumps({
        "cube": "lineitem_stats",
        "selectFields": [{"field": "Return Flag"}, {"field": "Revenue"},
                         {"field": "Total Quantity"}, {"field": "Line Count"}],
        "filterExpressions": [{"field": "Day", "operator": "between",
                               "from": "1995-03-01", "to": "1995-06-30"}],
        "sortBy": [{"field": "Return Flag", "order": "ASC"}],
        "rowsPerPage": -1,
    })).collect()
    assert len(rows) == len(expected) > 0
    for wire, eng in zip(rows, expected):
        assert wire[0] == eng[0]
        assert float(wire[1]) == pytest.approx(float(eng[1]), rel=1e-9)
        assert float(wire[2]) == pytest.approx(float(eng[2]), rel=1e-9)
        assert int(wire[3]) == int(eng[3])


def test_wire_join_dims(serving, engine):
    """Snowflake aliases resolve over the wire and aggregate identically."""
    client, _ = serving
    _, rows = client.query(
        'SELECT `Region Name` AS region, SUM(`Revenue`) AS revenue '
        "FROM global_temp.lineitem_stats "
        "WHERE `Day` BETWEEN DATE '1995-01-01' AND DATE '1995-12-31' "
        "GROUP BY `Region Name` ORDER BY region")
    expected = engine.dataframe(json.dumps({
        "cube": "lineitem_stats",
        "selectFields": [{"field": "Region Name"}, {"field": "Revenue"}],
        "filterExpressions": [{"field": "Day", "operator": "between",
                               "from": "1995-01-01", "to": "1995-12-31"}],
        "sortBy": [{"field": "Region Name", "order": "ASC"}],
        "rowsPerPage": -1,
    })).collect()
    assert len(rows) == len(expected) > 0
    for wire, eng in zip(rows, expected):
        assert wire[0] == eng[0]
        assert float(wire[1]) == pytest.approx(float(eng[1]), rel=1e-9)


def test_filtered_rollup_row_level(serving, engine):
    """FilteredRollup publishes CASE WHEN ... so client SUM == cube rollup."""
    client, _ = serving
    _, rows = client.query(
        'SELECT SUM(`Returned Quantity`) AS rq '
        "FROM global_temp.lineitem_stats "
        "WHERE `Day` BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'")
    expected = engine.dataframe(json.dumps({
        "cube": "lineitem_stats",
        "selectFields": [{"field": "Returned Quantity"}],
        "filterExpressions": [{"field": "Day", "operator": "between",
                               "from": "1995-01-01", "to": "1995-12-31"}],
        "rowsPerPage": -1,
    })).collect()
    assert float(rows[0][0]) == pytest.approx(float(expected[0][0]), rel=1e-9)
