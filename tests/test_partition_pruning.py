"""Date-partitioned fact layout: the mandatory Day bound must become a
PartitionFilter (directory pruning), and results must equal the
single-file layout exactly."""

from __future__ import annotations

import dataclasses
import os

import pytest

DAY_NARROW = {"field": "day", "operator": "between",
              "from": "1996-03-01", "to": "1996-03-31"}
REQ = {
    "cube": "tpch",
    "selectFields": [{"field": "return_flag"}, {"field": "revenue"},
                     {"field": "line_count"}],
    "filterExpressions": [DAY_NARROW],
}


@pytest.fixture(scope="module")
def part_engine(spark, sf_dir, tmp_path_factory):
    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.contract import build_contract_registry
    from maha_spark.plans.scale import partition_fact

    os.environ["MAHA_SPARK_CACHE"] = "0"
    base = tmp_path_factory.mktemp("partitioned")
    # lineitem -> dt=YYYY-MM-DD dirs; every other table stays a flat file
    partition_fact(spark, os.path.join(sf_dir, "lineitem.parquet"),
                   str(base / "lineitem"), day_col="l_shipdate")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "events"):
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"),
                   base / f"{t}.parquet")

    reg = build_contract_registry()
    for fact in reg._facts.values():
        fact.tables = [
            dataclasses.replace(t, partition_columns=["dt"])
            if t.name == "lineitem" else t
            for t in fact.tables]
    yield engine_for_dir(spark, reg, str(base))
    os.environ.pop("MAHA_SPARK_CACHE", None)


def test_day_bound_becomes_partition_filter(part_engine):
    df = part_engine.dataframe(REQ)
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    phys = qe.explainString(mode)
    assert "PartitionFilters" in phys
    # the dt bounds must actually appear in the partition filter clause
    pf_lines = [ln for ln in phys.splitlines() if "PartitionFilters" in ln]
    assert any("dt" in ln and "1996-03-01" in ln for ln in pf_lines), pf_lines


def test_partitioned_results_match_flat_layout(part_engine, spark, sf_dir):
    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.contract import build_contract_registry

    flat = engine_for_dir(spark, build_contract_registry(), sf_dir)
    got = sorted(map(tuple, part_engine.dataframe(REQ).collect()))
    want = sorted(map(tuple, flat.dataframe(REQ).collect()))
    assert got == want and len(got) > 0


def test_contract_fact_tables_declare_partition_layout():
    """Candidate selection can pick ANY covering table (q3 planned
    against the cheaper lineitem rollup, which silently lacked the dt
    declaration and lost directory pruning at the scaled tier) — every
    physical-fact candidate of the date-grain cubes must declare the
    dt layout."""
    from maha_spark.examples.contract import build_contract_registry

    reg = build_contract_registry()
    for cube in ("tpch", "events_cube"):
        for t in reg.fact(cube).tables:
            assert t.partition_columns == ["dt"], (cube, t.name, t.cost)
