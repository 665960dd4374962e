"""Avatica PROTOBUF wire protocol (stock-driver default serialization).

The reference serves both wire formats: ``AvaticaMahaJsonHandler`` and
``AvaticaMahaProtobufHandler``
(``service/.../calcite/avatica/MahaAvaticaService.scala`` registrations);
real Avatica JDBC drivers default to ``serialization=PROTOBUF``. No
protobuf library ships in this environment, so this module implements the
protobuf WIRE FORMAT directly (varint / zigzag / length-delimited /
fixed64 — the whole format is four wire types) plus hand-written
descriptors for exactly the Avatica message set the protocol needs
(``common.proto`` / ``requests.proto`` / ``responses.proto`` of Apache
Calcite Avatica; message/field numbers mirror those public .proto files).

Requests decode into the SAME dict shapes ``AvaticaHandler`` (JSON
protocol, avatica.py) dispatches on, and its dict responses encode back
into the protobuf ``WireMessage`` envelope — one protocol core, two
serializations, exactly the reference's handler split.
"""

from __future__ import annotations

from typing import Any

from ..core.protowire import (  # noqa: F401 — re-exported wire primitives
    _WT_LEN, _WT_VARINT, _field, _first, _len_always, _read_uvarint, _s,
    _unzigzag, _uvarint, _zigzag, decode_fields, f_bool, f_double, f_len,
    f_sint64, f_str, f_varint,
)

# ----------------------------------------------------- request descriptors
_REQ_PKG = "org.apache.calcite.avatica.proto.Requests$"
_RESP_PKG = "org.apache.calcite.avatica.proto.Responses$"


def _decode_request(name: str, body: bytes) -> dict[str, Any]:
    """Protobuf request -> the JSON-protocol dict AvaticaHandler handles.
    Field numbers follow avatica requests.proto."""
    f = decode_fields(body)
    kind = name.rsplit("$", 1)[-1]
    if kind == "OpenConnectionRequest":
        info = {}
        for _wt, entry in f.get(2, []):  # map<string,string> info = 2
            ef = decode_fields(entry)
            info[_s(ef, 1)] = _s(ef, 2)
        return {"request": "openConnection",
                "connectionId": _s(f, 1), "info": info}
    if kind == "CloseConnectionRequest":
        return {"request": "closeConnection", "connectionId": _s(f, 1)}
    if kind == "ConnectionSyncRequest":
        return {"request": "connectionSync", "connectionId": _s(f, 1),
                "connProps": {}}
    if kind == "CreateStatementRequest":
        return {"request": "createStatement", "connectionId": _s(f, 1)}
    if kind == "CloseStatementRequest":
        return {"request": "closeStatement", "connectionId": _s(f, 1),
                "statementId": _first(f, 2, -1)}
    if kind == "PrepareAndExecuteRequest":
        return {"request": "prepareAndExecute", "connectionId": _s(f, 1),
                "sql": _s(f, 2), "maxRowCount": _first(f, 3, -1),
                "statementId": _first(f, 4, -1)}
    if kind == "FetchRequest":
        return {"request": "fetch", "connectionId": _s(f, 1),
                "statementId": _first(f, 2, -1), "offset": _first(f, 3, 0)}
    if kind == "SyncResultsRequest":
        return {"request": "syncResults", "connectionId": _s(f, 1),
                "statementId": _first(f, 2, -1)}
    if kind == "CatalogsRequest":
        return {"request": "catalogs", "connectionId": _s(f, 1)}
    if kind == "TablesRequest":
        return {"request": "tables", "connectionId": _s(f, 7),
                "tableNamePattern": _s(f, 3, "%")}
    if kind == "ColumnsRequest":
        return {"request": "columns", "connectionId": _s(f, 5),
                "tableNamePattern": _s(f, 3, "%")}
    raise ValueError(f"unsupported protobuf request {kind!r}")


# ---------------------------------------------------- response encoding
#: common.proto Rep enum members used for scalar TypedValues
_REP_BOOLEAN, _REP_LONG, _REP_DOUBLE = 8, 13, 15
_REP_STRING, _REP_OBJECT, _REP_NULL = 21, 23, 24
_CURSOR_LIST = 4  # CursorFactory.Style.LIST


def _typed_value(v: Any) -> bytes:
    # TypedValue: type=1(enum) bool_value=2 string_value=3
    # number_value=4(sint64) bytes_value=5 double_value=6 null=7
    if v is None:
        return f_varint(1, _REP_NULL) + f_bool(7, True)
    if isinstance(v, bool):
        return f_varint(1, _REP_BOOLEAN) + f_bool(2, v)
    if isinstance(v, int):
        return f_varint(1, _REP_LONG) + f_sint64(4, v)
    if isinstance(v, float):
        return f_varint(1, _REP_DOUBLE) + f_double(6, v)
    return f_varint(1, _REP_STRING) + f_str(3, str(v))


def _column_value(v: Any) -> bytes:
    # ColumnValue: scalar_value=4, has_array_value=3
    return _len_always(4, _typed_value(v))


def _frame(frame: dict) -> bytes:
    rows = b""
    for row in frame.get("rows", []):
        row_msg = b"".join(_len_always(1, _column_value(v)) for v in row)
        rows += _len_always(3, row_msg)
    return (f_varint(1, frame.get("offset", 0))
            + f_bool(2, frame.get("done", True)) + rows)


def _avatica_type(col: dict) -> bytes:
    t = col["type"]
    return (f_varint(1, t.get("id", 12)) + f_str(2, t.get("name", "VARCHAR"))
            + f_varint(3, _REP_OBJECT))


def _column_meta(col: dict) -> bytes:
    # ColumnMetaData: ordinal=1 nullable=6 label=9 column_name=10 type=20
    return (f_varint(1, col.get("ordinal", 0))
            + f_varint(6, col.get("nullable", 1))
            + f_str(9, col.get("label", ""))
            + f_str(10, col.get("columnName", ""))
            + f_len(20, _avatica_type(col)))


def _signature(sig: dict) -> bytes:
    cols = b"".join(_len_always(1, _column_meta(c))
                    for c in sig.get("columns", []))
    return (cols + f_str(2, sig.get("sql") or "")
            + _len_always(4, f_varint(1, _CURSOR_LIST)))


def _result_set(rs: dict) -> bytes:
    # ResultSetResponse: connection_id=1 statement_id=2 own_statement=3
    # signature=4 first_frame=5 update_count=6
    return (f_str(1, rs.get("connectionId", ""))
            + f_varint(2, max(rs.get("statementId", 0), 0))
            + f_bool(3, rs.get("ownStatement", True))
            + f_len(4, _signature(rs.get("signature", {})))
            + f_len(5, _frame(rs.get("firstFrame", {"done": True})))
            + f_varint(6, (1 << 64) - 1))  # -1: query, not DML


def _encode_response(resp: dict[str, Any]) -> tuple[str, bytes]:
    kind = resp.get("response", "")
    if kind == "openConnection":
        return "OpenConnectionResponse", b""
    if kind == "closeConnection":
        return "CloseConnectionResponse", b""
    if kind == "connectionSync":
        return "ConnectionSyncResponse", b""
    if kind == "createStatement":
        return "CreateStatementResponse", (
            f_str(1, resp.get("connectionId", ""))
            + f_varint(2, resp.get("statementId", 0)))
    if kind == "closeStatement":
        return "CloseStatementResponse", b""
    if kind == "executeResults":
        body = b"".join(f_len(1, _result_set(rs))
                        for rs in resp.get("results", []))
        return "ExecuteResponse", body + f_bool(
            2, resp.get("missingStatement", False))
    if kind == "resultSet":
        return "ResultSetResponse", _result_set(resp)
    if kind == "fetch":
        return "FetchResponse", f_len(1, _frame(resp.get("frame", {})))
    if kind == "syncResults":
        return "SyncResultsResponse", f_bool(
            2, resp.get("moreResults", False))
    if kind == "error":
        return "ErrorResponse", (
            f_str(3, resp.get("errorMessage", ""))
            + f_varint(5, abs(resp.get("errorCode", 0)))
            + f_str(6, resp.get("sqlState", "00000")))
    raise ValueError(f"unsupported response kind {kind!r}")


# ------------------------------------------------------------- handler
class ProtobufAvaticaHandler:
    """Content-Type application/x-google-protobuf handler: WireMessage in,
    WireMessage out, protocol core shared with the JSON handler
    (AvaticaMahaProtobufHandler parity)."""

    def __init__(self, json_handler: Any):
        self.json_handler = json_handler

    def handle_bytes(self, data: bytes) -> bytes:
        try:
            wire = decode_fields(data)
            name = _s(wire, 1)
            req = _decode_request(name, _first(wire, 2, b""))
            resp = self.json_handler.handle(req)
        except Exception as e:
            resp = {"response": "error", "errorMessage": str(e)[:1000],
                    "errorCode": -1, "sqlState": "42000"}
        try:
            rkind, body = _encode_response(resp)
        except Exception as e:
            rkind, body = "ErrorResponse", (
                f_str(3, str(e)[:1000]) + f_str(6, "42000"))
        return f_str(1, _RESP_PKG + rkind) + f_len(2, body)


def encode_request(kind: str, fields: dict[str, Any]) -> bytes:
    """Client-side encoder (tests + any Python Avatica client): build the
    WireMessage for a named request from JSON-protocol field names."""
    b = b""
    if kind == "openConnection":
        b = f_str(1, fields.get("connectionId", ""))
        for k, v in (fields.get("info") or {}).items():
            b += f_len(2, f_str(1, k) + f_str(2, v))
    elif kind in ("closeConnection", "createStatement", "connectionSync"):
        b = f_str(1, fields.get("connectionId", ""))
    elif kind == "closeStatement":
        b = (f_str(1, fields.get("connectionId", ""))
             + f_varint(2, fields.get("statementId", 0)))
    elif kind == "prepareAndExecute":
        b = (f_str(1, fields.get("connectionId", ""))
             + f_str(2, fields.get("sql", ""))
             + f_varint(3, fields.get("maxRowCount", 0))
             + f_varint(4, fields.get("statementId", 0)))
    elif kind == "fetch":
        b = (f_str(1, fields.get("connectionId", ""))
             + f_varint(2, fields.get("statementId", 0))
             + f_varint(3, fields.get("offset", 0)))
    elif kind == "catalogs":
        b = f_str(1, fields.get("connectionId", ""))
    elif kind == "tables":
        b = (f_str(3, fields.get("tableNamePattern", "%"))
             + f_str(7, fields.get("connectionId", "")))
    elif kind == "columns":
        b = (f_str(3, fields.get("tableNamePattern", "%"))
             + f_str(5, fields.get("connectionId", "")))
    else:
        raise ValueError(f"unsupported request kind {kind!r}")
    cls = kind[0].upper() + kind[1:] + "Request"
    return f_str(1, _REQ_PKG + cls) + f_len(2, b)
