"""In-process Thrift JDBC server + a py4j JDBC client for tests.

The reference serves BI tools over Avatica/JDBC
(service/.../calcite/avatica/MahaAvaticaService.scala: describe, catalog
metadata, SQL execution). Spark ships the same capability as
HiveThriftServer2 -- a HiveServer2-protocol endpoint any `jdbc:hive2://`
client (beeline, DBeaver, JDBC drivers) can hit. We start it in-process
against the live SparkSession; the published global-temp cube views are
visible to every wire session without singleSession mode.

On a real cluster this is exactly the Spark Thrift Server deployment
(sbin/start-thriftserver.sh) pointed at the same registry bootstrap; the
in-process variant keeps tests hermetic.
"""

from __future__ import annotations

import socket
import time
from typing import Any, Optional

from pyspark.sql import SparkSession


class ThriftServingServer:
    def __init__(self, spark: SparkSession, port: int = 10000):
        self.spark = spark
        self.port = port
        self._jserver: Optional[Any] = None

    # ------------------------------------------------------------------
    def start(self, timeout: float = 60.0) -> "ThriftServingServer":
        # HiveConf is assembled from the session's SQL conf at start time,
        # so the port can be chosen at runtime (no static conf needed).
        self.spark.conf.set("hive.server2.thrift.port", str(self.port))
        self.spark.conf.set("hive.server2.thrift.bind.host", "localhost")
        jvm = self.spark._jvm
        jsql = self.spark._jsparkSession.sqlContext()
        self._jserver = (jvm.org.apache.spark.sql.hive.thriftserver
                         .HiveThriftServer2.startWithContext(jsql))
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self._port_open():
                return self
            time.sleep(0.25)
        raise TimeoutError(f"thrift server did not open port {self.port}")

    def _port_open(self) -> bool:
        try:
            with socket.create_connection(("localhost", self.port), 1.0):
                return True
        except OSError:
            return False

    def stop(self) -> None:
        if self._jserver is not None:
            self._jserver.stop()
            self._jserver = None

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:hive2://localhost:{self.port}/default"


def _to_py(v: Any) -> Any:
    """ResultSet.getObject -> Python. py4j auto-converts primitives;
    BigDecimal/Timestamp/Date arrive as JavaObjects -> parse via toString."""
    if v is None or isinstance(v, (bool, int, float, str, bytes)):
        return v
    s = v.toString()
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


class JdbcClient:
    """Minimal JDBC client over py4j using the hive-jdbc driver that ships
    in Spark's jars -- a REAL wire round-trip (TCP + Thrift SASL), not a
    same-process shortcut."""

    def __init__(self, spark: SparkSession, url: str,
                 user: str = "anonymous"):
        self._jvm = spark._jvm
        self._conn = self._jvm.java.sql.DriverManager.getConnection(
            url, user, "")

    # ------------------------------------------------------------------
    def query(self, sql: str) -> tuple[list[str], list[tuple]]:
        st = self._conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            md = rs.getMetaData()
            n = md.getColumnCount()
            cols = [md.getColumnName(i + 1) for i in range(n)]
            rows = []
            while rs.next():
                rows.append(tuple(_to_py(rs.getObject(i + 1))
                                  for i in range(n)))
            return cols, rows
        finally:
            st.close()

    def describe(self, sql: str) -> list[tuple[str, str]]:
        """Schema-only round trip (the reference's describe = LIMIT 0)."""
        st = self._conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            md = rs.getMetaData()
            return [(md.getColumnName(i + 1), md.getColumnTypeName(i + 1))
                    for i in range(md.getColumnCount())]
        finally:
            st.close()

    def tables(self, schema: str = "global_temp") -> list[str]:
        rs = self._conn.getMetaData().getTables(None, schema, "%", None)
        out = []
        while rs.next():
            out.append(rs.getString(3))
        return out

    def columns(self, table: str,
                schema: str = "global_temp") -> list[tuple[str, str]]:
        rs = self._conn.getMetaData().getColumns(None, schema, table, "%")
        out = []
        while rs.next():
            out.append((rs.getString(4), rs.getString(6)))
        return out

    def close(self) -> None:
        self._conn.close()
