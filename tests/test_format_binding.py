"""Source pluggability: the same cube served from CSV and JSON bindings
(the reference's engine-per-table binding collapsed onto Spark DataSource
formats)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.engine import MahaSparkEngine  # noqa: E402
from maha_spark.plans.binding import FormatBinding  # noqa: E402


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    import duckdb
    d = tmp_path_factory.mktemp("csvsrc")
    con = duckdb.connect()
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf}/{t}.parquet')) "
            f"TO '{d}/{t}.csv' (HEADER, TIMESTAMP_FORMAT "
            f"'%Y-%m-%d %H:%M:%S')")
    con.close()
    return str(d)


def test_cube_query_over_csv_binding(spark, csv_dir, engine):
    from maha_spark.examples.tpch import build_registry
    binding = FormatBinding(
        spark, csv_dir, fmt="csv",
        options={"header": "true", "inferSchema": "true",
                 "timestampFormat": "yyyy-MM-dd HH:mm:ss"})
    csv_eng = MahaSparkEngine(spark, build_registry(), binding)
    req = {
        "cube": "lineitem_stats",
        "selectFields": [{"field": "Nation Name"}, {"field": "Revenue"}],
        "filterExpressions": [{"field": "Day", "operator": "between",
                               "from": "1995-01-01", "to": "2002-12-31"}],
    }
    got = {(r["Nation Name"], round(r["Revenue"], 2))
           for r in csv_eng.dataframe(req).collect()}
    exp = {(r["Nation Name"], round(r["Revenue"], 2))
           for r in engine.dataframe(req).collect()}
    assert got == exp and len(got) > 0


def test_cube_query_over_json_binding(spark, tmp_path, engine):
    import duckdb
    from maha_spark.examples.tpch import build_registry
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf}/{t}.parquet')) "
            f"TO '{tmp_path}/{t}.json' (FORMAT JSON, TIMESTAMP_FORMAT "
            f"'%Y-%m-%d %H:%M:%S')")
    con.close()
    binding = FormatBinding(
        spark, str(tmp_path), fmt="json",
        options={"timestampFormat": "yyyy-MM-dd HH:mm:ss"})
    js_eng = MahaSparkEngine(spark, build_registry(), binding)
    req = {
        "cube": "lineitem_stats",
        "selectFields": [{"field": "Region Name"}, {"field": "Line Count"}],
        "filterExpressions": [{"field": "Day", "operator": "between",
                               "from": "1995-01-01", "to": "2002-12-31"}],
    }
    got = {(r[0], round(r[1], 2)) for r in js_eng.dataframe(req).collect()}
    exp = {(r[0], round(r[1], 2)) for r in engine.dataframe(req).collect()}
    assert got == exp and len(got) > 0


def test_cache_policy_size_gated(spark, monkeypatch):
    """Auto-cache is size-gated: small tables (dims) stay hot, a table
    over the byte cap is NEVER cached — at cluster scale caching an
    unbounded fact would evict/thrash the whole storage pool."""
    from maha_spark.plans import binding as b

    pb = b.ParquetBinding(spark, "/root/testdata/sf0.01")
    monkeypatch.setenv("MAHA_SPARK_CACHE", "1")
    # cap below lineitem's size but above nation's
    lf = b._path_bytes("/root/testdata/sf0.01/lineitem.parquet")
    nf = b._path_bytes("/root/testdata/sf0.01/nation.parquet")
    assert nf < lf
    monkeypatch.setenv("MAHA_SPARK_CACHE_MAX_BYTES", str(nf + 1))
    fact = pb.table("lineitem")
    assert not fact.storageLevel.useMemory
    dim = pb.table("nation")
    assert dim.storageLevel.useMemory
    dim.unpersist()
    b._DF_CACHE.pop((id(spark), "/root/testdata/sf0.01/nation.parquet"), None)
