"""Driver contract for the spark-graft builder (PySpark target).

Every ``queries()`` entry runs through the maha_spark semantic-layer engine
(JSON reporting request -> validation -> RequestModel -> DataFrame planner)
or a first-class data-pipeline operator (dedup / similarity / text
analysis). ``oracle_sql()`` provides the DuckDB-equivalent SQL; value
determinism across engines is guaranteed by exact decimal aggregation
(see maha_spark/examples/contract.py docstring).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maha_spark.examples import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary through the cube engine)."""
    return contract.run_query(spark, "/root/testdata/sf0.001",
                              "q1_pricing_summary")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    def make(name: str):
        return lambda spark, sf_dir: contract.run_query(spark, sf_dir, name)

    for name in contract.QUERIES:
        out[name] = make(name)

    try:
        from maha_spark.ops import entry_queries as ops_queries
        out.update(ops_queries())
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: q["sql"] for name, q in contract.QUERIES.items()
           if q.get("sql")}
    try:
        from maha_spark.ops import entry_oracles as ops_oracles
        out.update(ops_oracles())
    except ImportError:
        pass
    return out
