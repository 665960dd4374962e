"""Avatica JSON wire protocol over the cube SQL entry.

The reference serves BI tools through Apache Calcite Avatica
(``service/.../calcite/avatica/MahaAvaticaService.scala``: connection
lifecycle, JDBC catalog metadata, ``DESCRIBE <cube>``, and SQL SELECTs
translated to ReportingRequests; JSON handler
``AvaticaMahaJsonHandler.scala``). This module speaks the same JSON
protocol (calcite.apache.org/avatica JSON reference) against the
Spark engine:

* ``openConnection`` / ``closeConnection`` — per-connection user info
  (``ConnectionUserInfo``: userId + schema), exactly the reference's
  ``ConnectionUserInfoProvider`` role;
* ``createStatement`` / ``closeStatement`` — statement ids;
* ``prepareAndExecute`` — ``DESCRIBE <cube>`` returns the column
  metadata frame (alias, column kind, data type, comment —
  MahaAvaticaService.scala:383-405 row shape); any SELECT routes
  through ``engine.execute_sql`` (SQL -> ReportingRequest -> DataFrame)
  and returns the rows in ``firstFrame`` (bounded by the sync row cap,
  so one frame always suffices — matching the reference, which never
  paginates frames either);
* ``catalogs`` / ``tables`` / ``columns`` — JDBC metadata over the
  registry (tableMetaArray / columnMetaArray shapes).

Scale posture: identical to the REST query route — the wire layer only
serializes; execution stays on the cluster and result sizes are bounded
by the request-level row caps.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field
from typing import Any, Optional

from ..core.types import DateType, DecType, IntType, StrType
from ..core.types import TimestampType as MahaTimestampType

METRIC_COLUMN = "Metric/Fact Column"
DIMENSION_COLUMN = "Dimension Column"
DIMENSION_JOIN_COLUMN = "Dimension Join Column"

#: java.sql.Types ids (DataType.scala sqlDataType parity)
_SQL_TYPES = {"varchar": 12, "number": 3, "integer": -5, "date": 91,
              "timestamp": 93}


def _type_name(dtype: Any) -> str:
    if isinstance(dtype, IntType):
        return "integer"
    if isinstance(dtype, DecType):
        return "number"
    if isinstance(dtype, DateType):
        return "date"
    if isinstance(dtype, MahaTimestampType):
        return "timestamp"
    if isinstance(dtype, StrType):
        return "varchar"
    return "varchar"


@dataclass
class ConnectionUserInfo:
    user_id: str = "calcite-avatica"
    schema: str = "internal"
    statements: set[int] = field(default_factory=set)


class AvaticaHandler:
    """JSON-protocol request dispatcher bound to one engine."""

    def __init__(self, engine: Any):
        self.engine = engine
        self.connections: dict[str, ConnectionUserInfo] = {}
        self._stmt_ids = itertools.count(1)

    # ------------------------------------------------------------ dispatch
    def handle(self, req: dict[str, Any]) -> dict[str, Any]:
        kind = req.get("request", "")
        fn = getattr(self, f"_handle_{kind}", None)
        if fn is None:
            return {"response": "error",
                    "errorMessage": f"unsupported request {kind!r}",
                    "errorCode": -1, "sqlState": "0A000"}
        try:
            return fn(req)
        except Exception as e:
            return {"response": "error", "errorMessage": str(e)[:1000],
                    "errorCode": -1, "sqlState": "42000"}

    # --------------------------------------------------------- connection
    def _handle_openConnection(self, req: dict) -> dict:
        info = req.get("info") or {}
        self.connections[req["connectionId"]] = ConnectionUserInfo(
            user_id=info.get("user", "calcite-avatica"),
            schema=info.get("schema", "internal"))
        return {"response": "openConnection",
                "connectionId": req["connectionId"]}

    def _handle_closeConnection(self, req: dict) -> dict:
        self.connections.pop(req["connectionId"], None)
        return {"response": "closeConnection",
                "connectionId": req["connectionId"]}

    def _handle_connectionSync(self, req: dict) -> dict:
        return {"response": "connectionSync",
                "connectionId": req["connectionId"],
                "connProps": req.get("connProps", {})}

    def _handle_createStatement(self, req: dict) -> dict:
        sid = next(self._stmt_ids)
        self._conn(req).statements.add(sid)
        return {"response": "createStatement",
                "connectionId": req["connectionId"], "statementId": sid}

    def _handle_closeStatement(self, req: dict) -> dict:
        self._conn(req).statements.discard(req.get("statementId", -1))
        return {"response": "closeStatement",
                "connectionId": req["connectionId"]}

    def _conn(self, req: dict) -> ConnectionUserInfo:
        return self.connections.setdefault(
            req.get("connectionId", ""), ConnectionUserInfo())

    # ------------------------------------------------------------ execute
    def _handle_prepareAndExecute(self, req: dict) -> dict:
        sql = req.get("sql", "")
        conn = self._conn(req)
        sid = req.get("statementId", -1)
        m = re.match(r"\s*describe\s+(\S+)\s*$", sql, re.IGNORECASE)
        if m:
            rs = self._describe_frame(req["connectionId"], sid,
                                      m.group(1).strip('"`'))
        else:
            rs = self._select_frame(req["connectionId"], sid, sql, conn)
        return {"response": "executeResults", "missingStatement": False,
                "results": [rs]}

    def _describe_frame(self, cid: str, sid: int, cube: str) -> dict:
        """DESCRIBE <cube>: one row per public alias
        (MahaAvaticaService.scala describe rows: alias, kind label,
        data type, comment)."""
        registry = self.engine.registry
        fact = registry.fact(cube)
        rows, seen = [], set()
        for p in fact.pub_cols:
            dt = self._fact_dtype(fact, p)
            if p.alias not in seen:
                seen.add(p.alias)
                rows.append([p.alias, DIMENSION_COLUMN, _type_name(dt),
                             self._comment(p)])
        for p in fact.pub_fact_cols:
            dt = self._fact_dtype(fact, p)
            if p.alias not in seen:
                seen.add(p.alias)
                rows.append([p.alias, METRIC_COLUMN, _type_name(dt),
                             self._comment(p)])
        for dname in self._reachable_dims(fact):
            d = registry.dimension(dname)
            for p in d.pub_cols:
                if p.alias in seen:
                    continue
                seen.add(p.alias)
                col = d.table.columns.get(p.name)
                rows.append([p.alias, DIMENSION_JOIN_COLUMN,
                             _type_name(col.dtype if col else None),
                             self._comment(p)])
        cols = ["COLUMN_NAME", "COLUMN_KIND", "TYPE_NAME", "REMARKS"]
        return self._result_set(cid, sid, cols,
                                ["varchar"] * len(cols), rows)

    def _select_frame(self, cid: str, sid: int, sql: str,
                      conn: ConnectionUserInfo) -> dict:
        env = self.engine.execute_sql(sql, schema=conn.schema)
        fields = env["header"]["fields"]
        names = [f["fieldName"] for f in fields]
        kinds = ["number" if f["fieldType"] == "FACT" else "varchar"
                 for f in fields]
        return self._result_set(cid, sid, names, kinds, env["rows"],
                                sql=sql)

    def _handle_fetch(self, req: dict) -> dict:
        """Everything fits in firstFrame (row caps bound result size), so
        any fetch past it is an empty done frame."""
        return {"response": "fetch",
                "connectionId": req.get("connectionId", ""),
                "statementId": req.get("statementId", -1),
                "frame": {"offset": req.get("offset", 0), "done": True,
                          "rows": []}}

    def _handle_syncResults(self, req: dict) -> dict:
        return {"response": "syncResults", "moreResults": False,
                "missingStatement": False}

    # ----------------------------------------------------------- metadata
    def _handle_catalogs(self, req: dict) -> dict:
        return self._result_set(req.get("connectionId", ""), -1,
                                ["TABLE_CAT"], ["varchar"], [[""]])

    def _handle_tables(self, req: dict) -> dict:
        cols = ["TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "TABLE_TYPE",
                "REMARKS", "TYPE_CAT", "TYPE_SCHEM", "TYPE_NAME",
                "SELF_REFERENCING_COL_NAME", "REF_GENERATION"]
        rows = [["", "maha", name, "fact", "", "", "", "", "", ""]
                for name in self.engine.registry.cubes()]
        return self._result_set(req.get("connectionId", ""), -1, cols,
                                ["varchar"] * len(cols), rows)

    def _handle_columns(self, req: dict) -> dict:
        """columnMetaArray shape (24 JDBC DatabaseMetaData.getColumns
        fields, MahaAvaticaServiceHelper.columnMetaArray)."""
        pat = req.get("tableNamePattern") or "%"
        like = re.compile("^" + re.escape(pat).replace("%", ".*")
                          .replace("_", ".") + "$")
        registry = self.engine.registry
        cols = ["TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "COLUMN_NAME",
                "DATA_TYPE", "TYPE_NAME", "COLUMN_SIZE", "BUFFER_LENGTH",
                "DECIMAL_DIGITS", "NUM_PREC_RADIX", "NULLABLE", "REMARKS",
                "COLUMN_DEF", "SQL_DATA_TYPE", "SQL_DATETIME_SUB",
                "CHAR_OCTET_LENGTH", "ORDINAL_POSITION", "IS_NULLABLE",
                "SCOPE_CATALOG", "SCOPE_SCHEMA", "SCOPE_TABLE",
                "SOURCE_DATA_TYPE", "IS_AUTOINCREMENT",
                "IS_GENERATEDCOLUMN"]
        rows = []
        for name in registry.cubes():
            if not like.match(name):
                continue
            fact = registry.fact(name)
            pos = 1
            seen: set[str] = set()
            trips = ([(p, DIMENSION_COLUMN, self._fact_dtype(fact, p))
                      for p in fact.pub_cols]
                     + [(p, METRIC_COLUMN, self._fact_dtype(fact, p))
                        for p in fact.pub_fact_cols])
            for dname in self._reachable_dims(fact):
                d = registry.dimension(dname)
                trips += [(p, DIMENSION_JOIN_COLUMN,
                           (d.table.columns[p.name].dtype
                            if p.name in d.table.columns else None))
                          for p in d.pub_cols]
            for p, kind, dt in trips:
                if p.alias in seen:
                    continue
                seen.add(p.alias)
                tname = _type_name(dt)
                rows.append(["", "maha", name, p.alias,
                             _SQL_TYPES.get(tname, 12), tname, 255, None,
                             38 if tname == "number" else None, 10, 1,
                             kind, kind, _SQL_TYPES.get(tname, 12), None,
                             None, pos, "YES", None, None, None, None,
                             "NO", "NO"])
                pos += 1
        return self._result_set(req.get("connectionId", ""), -1, cols,
                                ["varchar"] * len(cols), rows)

    # ------------------------------------------------------------ helpers
    def _fact_dtype(self, fact: Any, pub: Any):
        for t in fact.tables:
            col = t.columns.get(pub.name)
            if col is not None:
                return col.dtype
        return None

    def _reachable_dims(self, fact: Any) -> list[str]:
        """Direct FK dimensions plus snowflake parents (the reference
        walks foreignKeySources one level; chains here are transitive
        because the SQL entry can project any chain alias)."""
        registry = self.engine.registry
        out: list[str] = []
        frontier = []
        for t in fact.tables:
            for c in t.columns.values():
                fk = getattr(c, "foreign_key", None)
                if fk and fk not in out:
                    out.append(fk)
                    frontier.append(fk)
        while frontier:
            d = registry.dimension(frontier.pop(0))
            for parent in d.table.parent_keys.values():
                if parent not in out:
                    out.append(parent)
                    frontier.append(parent)
        return out

    @staticmethod
    def _comment(pub: Any) -> str:
        ops = ",".join(sorted(pub.filter_ops)) if pub.filter_ops else ""
        return f"Filters: [{ops}]" if ops else ""

    @staticmethod
    def _result_set(cid: str, sid: int, names: list, kinds: list,
                    rows: list, sql: str = "") -> dict:
        columns = [{
            "ordinal": i,
            "columnName": n,
            "label": n,
            "type": {"type": "scalar",
                     "id": _SQL_TYPES.get(k, 12),
                     "name": k.upper(),
                     "rep": "OBJECT"},
            "nullable": 1,
        } for i, (n, k) in enumerate(zip(names, kinds))]
        return {
            "response": "resultSet",
            "connectionId": cid,
            "statementId": sid,
            "ownStatement": True,
            "signature": {"columns": columns, "sql": sql or None,
                          "parameters": [],
                          "cursorFactory": {"style": "LIST"},
                          "statementType": "SELECT"},
            "firstFrame": {"offset": 0, "done": True, "rows": rows},
            "updateCount": -1,
        }
