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


# ---------------------------------------------------------------- protobuf
def pb_rpc(srv, kind: str, fields: dict) -> tuple[str, dict]:
    """POST a protobuf WireMessage; return (response class name, fields)."""
    from maha_spark.serving.avatica_proto import (
        decode_fields, encode_request, _first,
    )
    req = urllib.request.Request(
        srv.base_url + "/sql-avatica", data=encode_request(kind, fields),
        headers={"Content-Type": "application/x-google-protobuf"},
        method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        assert "protobuf" in r.headers.get("Content-Type", "")
        wire = decode_fields(r.read())
    name = wire[1][0][1].decode()
    return name.rsplit("$", 1)[-1], decode_fields(_first(wire, 2, b""))


def _pb_rows(rs_fields: dict) -> list[list]:
    """Decode Frame rows out of a ResultSetResponse's fields."""
    from maha_spark.serving.avatica_proto import decode_fields, _first
    frame = decode_fields(_first(rs_fields, 5, b""))
    rows = []
    for _wt, row_msg in frame.get(3, []):
        row = []
        for _wt2, colval in decode_fields(row_msg).get(1, []):
            tv = decode_fields(_first(decode_fields(colval), 4, b""))
            rep = _first(tv, 1, 0)
            if rep == 24:          # NULL
                row.append(None)
            elif rep == 21:        # STRING
                row.append(_first(tv, 3, b"").decode())
            elif rep == 13:        # LONG (sint64 zigzag)
                n = _first(tv, 4, 0)
                row.append((n >> 1) ^ -(n & 1))
            elif rep == 15:        # DOUBLE (fixed64 bits)
                import struct
                row.append(struct.unpack("<d",
                                         struct.pack("<q",
                                                     _first(tv, 6, 0)))[0])
            else:
                row.append(_first(tv, 3, b""))
        rows.append(row)
    return rows


def test_protobuf_lifecycle_and_select(rest, engine):
    """prepareAndExecute over the protobuf wire: open -> statement ->
    SELECT -> values match the engine's own result -> close."""
    kind, _ = pb_rpc(rest, "openConnection",
                     {"connectionId": "pbc1",
                      "info": {"user": "pb", "schema": "internal"}})
    assert kind == "OpenConnectionResponse"
    kind, f = pb_rpc(rest, "createStatement", {"connectionId": "pbc1"})
    assert kind == "CreateStatementResponse"
    sid = f[2][0][1]
    sql = ("SELECT `Nation Name`, `Revenue` FROM lineitem_stats "
           "WHERE `Day` BETWEEN '1995-01-01' AND '2002-12-31' "
           "ORDER BY `Revenue` DESC LIMIT 3")
    kind, f = pb_rpc(rest, "prepareAndExecute",
                     {"connectionId": "pbc1", "statementId": sid,
                      "sql": sql, "maxRowCount": 100})
    assert kind == "ExecuteResponse"
    from maha_spark.serving.avatica_proto import decode_fields, _first
    rs = decode_fields(f[1][0][1])
    rows = _pb_rows(rs)
    expected = [[r[0], float(r[1])] for r in engine.sql(sql).collect()]
    assert [[r[0], float(r[1])] for r in rows] == expected
    # signature carries both column names
    sig = decode_fields(_first(rs, 4, b""))
    labels = [_first(decode_fields(c), 9, b"").decode()
              for _wt, c in sig.get(1, [])]
    assert labels == ["Nation Name", "Revenue"]
    kind, _ = pb_rpc(rest, "closeStatement",
                     {"connectionId": "pbc1", "statementId": sid})
    assert kind == "CloseStatementResponse"
    kind, _ = pb_rpc(rest, "closeConnection", {"connectionId": "pbc1"})
    assert kind == "CloseConnectionResponse"


def test_protobuf_error_response(rest):
    kind, f = pb_rpc(rest, "prepareAndExecute",
                     {"connectionId": "pbc2", "statementId": 1,
                      "sql": "SELECT nope FROM nope"})
    assert kind == "ErrorResponse"
    from maha_spark.serving.avatica_proto import _first
    assert _first(f, 6, b"").decode() == "42000"  # sql_state


def test_protobuf_catalog_metadata(rest):
    kind, f = pb_rpc(rest, "tables", {"connectionId": "pbc3"})
    assert kind == "ResultSetResponse"
    rows = _pb_rows(f)
    assert any("lineitem_stats" in row for row in rows)
