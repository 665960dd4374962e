"""Bucketing (revision A/B) and curator (drilldown / timeshift /
totalmetrics / rowcount) behavior."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.core.bucketing import (  # noqa: E402
    BucketSelector, CubeBucketConfig,
)

DAY_ALL = {"field": "day", "operator": "between",
           "from": "1995-01-01", "to": "2002-12-31"}


# --------------------------------------------------------------- bucketing
def test_bucket_split_deterministic_and_proportional():
    sel = BucketSelector({
        "tpch": CubeBucketConfig("tpch", internal={0: 90, 1: 10}),
    })
    picks = [sel.select("tpch", user_id=f"u{i}").revision
             for i in range(2000)]
    # same user -> same revision, always
    assert all(sel.select("tpch", user_id="u7").revision == picks[7]
               for _ in range(5))
    frac_rev1 = picks.count(1) / len(picks)
    assert 0.05 < frac_rev1 < 0.15  # ~10%


def test_bucket_defaults_and_dry_run():
    sel = BucketSelector({
        "tpch": CubeBucketConfig("tpch", internal={0: 100},
                                 dry_run={2: 100}),
    })
    s = sel.select("tpch", user_id="anyone")
    assert s.revision == 0 and s.dry_run_revision == 2
    # unknown cube -> no opinion (registry default)
    assert sel.select("other", user_id="x").revision is None


def test_bucket_pct_must_sum_100():
    with pytest.raises(ValueError):
        CubeBucketConfig("c", internal={0: 50, 1: 10})


# --------------------------------------------------------------- curators
@pytest.fixture(scope="module")
def contract_engine(spark):
    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.contract import build_contract_registry
    return engine_for_dir(spark, build_contract_registry(),
                          "/root/testdata/sf0.001")


def test_totalmetrics_and_rowcount(contract_engine, duck):
    out = contract_engine.execute({
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}, {"field": "revenue"}],
        "filterExpressions": [DAY_ALL],
        "rowsPerPage": 2,
        "curators": {"totalmetrics": {}, "rowcount": {}},
    })
    assert len(out["rows"]) == 2
    tm = out["curators"]["totalmetrics"]
    assert len(tm["rows"]) == 1
    rc = out["curators"]["rowcount"]
    n_flags = duck.execute(
        "SELECT COUNT(DISTINCT l_returnflag) FROM lineitem").fetchone()[0]
    assert rc["rows"][0][0] == n_flags
    total = duck.execute(
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * "
        "(1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) "
        "FROM lineitem").fetchone()[0]
    assert tm["rows"][0][0] == pytest.approx(total, rel=1e-12)


def test_drilldown(contract_engine):
    out = contract_engine.execute({
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}, {"field": "revenue"}],
        "filterExpressions": [DAY_ALL],
        "curators": {"drilldown": {"config": {"dimension": "line_status"}}},
    })
    dd = out["curators"]["drilldown"]
    fields = [f["fieldName"] for f in dd["header"]["fields"]]
    assert fields[0] == "line_status"
    assert "revenue" in fields
    # drilldown rows sorted by first metric desc
    revs = [r[fields.index("revenue")] for r in dd["rows"]]
    assert revs == sorted(revs, reverse=True)


def test_timeshift(contract_engine, duck):
    out = contract_engine.execute({
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}, {"field": "revenue"}],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "1997-01-01", "to": "1997-12-31"}],
        "curators": {"timeshift": {}},
    })
    ts = out["curators"]["timeshift"]
    fields = [f["fieldName"] for f in ts["header"]["fields"]]
    assert "revenue Prev" in fields and "revenue Pct Change" in fields
    # verify one row's Prev against DuckDB (previous 365-day window)
    flag = ts["rows"][0][fields.index("return_flag")]
    prev = duck.execute(f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
               (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE)
              BETWEEN DATE '1996-01-02' AND DATE '1996-12-31'
          AND l_returnflag = '{flag}'""").fetchone()[0]
    assert ts["rows"][0][fields.index("revenue Prev")] == \
        pytest.approx(prev, rel=1e-12)


def test_engine_bucketed_revision(spark):
    """Engine + BucketSelector picks the configured revision."""
    from maha_spark.engine import MahaSparkEngine
    from maha_spark.examples.contract import build_contract_registry
    from maha_spark.plans.binding import ParquetBinding
    reg = build_contract_registry()
    sel = BucketSelector({"tpch": CubeBucketConfig("tpch", internal={0: 100})})
    eng = MahaSparkEngine(spark, reg,
                          ParquetBinding(spark, "/root/testdata/sf0.001"),
                          bucket_selector=sel)
    m = eng.model({"cube": "tpch",
                   "selectFields": [{"field": "return_flag"},
                                    {"field": "revenue"}],
                   "filterExpressions": [DAY_ALL]}, user_id="u1")
    assert m.cube.revision == 0
