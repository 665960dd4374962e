"""Avatica JSON wire protocol (reference MahaAvaticaService /
AvaticaMahaJsonHandler): connection lifecycle, catalog metadata,
DESCRIBE, and a SELECT over live HTTP."""

from __future__ import annotations

import json
import urllib.request

import pytest


@pytest.fixture(scope="module")
def rest(engine):
    from maha_spark.serving.rest import RestServer
    srv = RestServer(engine, registry_name="maha").start()
    yield srv
    srv.stop()


def rpc(srv, body: dict) -> dict:
    req = urllib.request.Request(
        srv.base_url + "/sql-avatica", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        return json.loads(r.read())


def test_connection_and_statement_lifecycle(rest):
    out = rpc(rest, {"request": "openConnection", "connectionId": "c1",
                     "info": {"user": "u1", "schema": "internal"}})
    assert out == {"response": "openConnection", "connectionId": "c1"}

    out = rpc(rest, {"request": "createStatement", "connectionId": "c1"})
    assert out["response"] == "createStatement"
    sid = out["statementId"]

    out = rpc(rest, {"request": "closeStatement", "connectionId": "c1",
                     "statementId": sid})
    assert out["response"] == "closeStatement"

    out = rpc(rest, {"request": "closeConnection", "connectionId": "c1"})
    assert out["response"] == "closeConnection"


def test_catalog_metadata(rest):
    out = rpc(rest, {"request": "tables", "connectionId": "c2"})
    assert out["response"] == "resultSet"
    names = [r[2] for r in out["firstFrame"]["rows"]]
    assert "lineitem_stats" in names
    cols = [c["columnName"] for c in out["signature"]["columns"]]
    assert cols[:3] == ["TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME"]

    out = rpc(rest, {"request": "columns", "connectionId": "c2",
                     "tableNamePattern": "lineitem%"})
    rows = out["firstFrame"]["rows"]
    assert len(out["signature"]["columns"]) == 24  # JDBC getColumns shape
    by_name = {r[3]: r for r in rows}
    assert by_name["Revenue"][5] == "number"
    assert by_name["Return Flag"][5] == "varchar"


def test_describe_cube(rest):
    out = rpc(rest, {"request": "prepareAndExecute", "connectionId": "c3",
                     "statementId": 7, "sql": "DESCRIBE lineitem_stats"})
    assert out["response"] == "executeResults"
    rs = out["results"][0]
    assert rs["firstFrame"]["done"] is True
    kinds = {r[0]: r[1] for r in rs["firstFrame"]["rows"]}
    assert kinds["Revenue"] == "Metric/Fact Column"
    assert kinds["Return Flag"] == "Dimension Column"
    # snowflake-reachable dim attribute (customer -> nation chain)
    assert kinds["Nation Name"] == "Dimension Join Column"


def test_select_over_wire(rest, engine):
    rpc(rest, {"request": "openConnection", "connectionId": "c4",
               "info": {"user": "u", "schema": "internal"}})
    sql = ('SELECT "Return Flag", "Revenue" FROM lineitem_stats '
           "WHERE \"Day\" BETWEEN '1995-01-01' AND '2002-12-31'")
    out = rpc(rest, {"request": "prepareAndExecute", "connectionId": "c4",
                     "statementId": 1, "sql": sql})
    rs = out["results"][0]
    assert rs["response"] == "resultSet"
    names = [c["columnName"] for c in rs["signature"]["columns"]]
    assert names == ["Return Flag", "Revenue"]
    wire_rows = rs["firstFrame"]["rows"]
    env = engine.execute_sql(sql)
    assert wire_rows == env["rows"]
    assert rs["firstFrame"]["done"] is True


def test_error_response_shape(rest):
    out = rpc(rest, {"request": "prepareAndExecute", "connectionId": "c5",
                     "statementId": 1, "sql": "SELECT nope FROM nocube"})
    assert out["response"] == "error"
    assert out["sqlState"] == "42000"

    out = rpc(rest, {"request": "bogusKind"})
    assert out["response"] == "error" and out["sqlState"] == "0A000"


def test_columns_include_dim_join_attributes(rest):
    out = rpc(rest, {"request": "columns", "connectionId": "c6",
                     "tableNamePattern": "lineitem_stats"})
    by_name = {r[3]: r for r in out["firstFrame"]["rows"]}
    assert by_name["Nation Name"][11] == "Dimension Join Column"


def test_fetch_past_first_frame_is_empty_done(rest):
    out = rpc(rest, {"request": "fetch", "connectionId": "c6",
                     "statementId": 1, "offset": 100, "fetchMaxRowCount": 10})
    assert out["frame"] == {"offset": 100, "done": True, "rows": []}
