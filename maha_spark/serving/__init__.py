"""JDBC/SQL serving surface (reference: MahaAvaticaService parity).

The reference exposes cubes to BI tools over an Avatica/JDBC wire
(`service/.../calcite/avatica/MahaAvaticaService.scala`): clients send SQL,
the service answers describe/metadata plus query results. Spark-first
equivalent: publish each cube as a flattened semantic view and serve it
through Spark's own HiveThriftServer2, so ANY `jdbc:hive2://` client
(beeline, JDBC BI tools) gets catalog metadata + SQL over the cubes with
the semantic layer (decodes, snowflake joins, forced filters) baked in.
"""

from .views import cube_view_df, publish_registry
from .server import ThriftServingServer, JdbcClient

__all__ = ["cube_view_df", "publish_registry", "ThriftServingServer",
           "JdbcClient"]
