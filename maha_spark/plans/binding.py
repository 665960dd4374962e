"""Physical table binding: physical table name -> DataFrame.

The reference binds facts/dims to engines (Druid/Oracle/...); here a
binding maps a physical name to a Spark DataFrame — by default parquet
files under a base directory (the driver's testdata layout), but any
DataFrame source (Delta, JDBC, a registered temp view) can be bound.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


class TableBinding:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._overrides: dict[str, Callable[[], DataFrame]] = {}

    def bind(self, name: str, loader: Callable[[], DataFrame]) -> None:
        self._overrides[name] = loader

    def table(self, name: str) -> DataFrame:
        if name in self._overrides:
            return self._overrides[name]()
        raise KeyError(f"no binding for table {name!r}")


class ParquetBinding(TableBinding):
    """Reads ``{base_dir}/{name}.parquet``; falls back to a catalog table."""

    def __init__(self, spark: SparkSession, base_dir: str):
        super().__init__(spark)
        self.base_dir = base_dir

    def table(self, name: str) -> DataFrame:
        if name in self._overrides:
            return self._overrides[name]()
        path = os.path.join(self.base_dir, f"{name}.parquet")
        if os.path.exists(path):
            return self.spark.read.parquet(path)
        return self.spark.table(name)
