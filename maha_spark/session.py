"""SparkSession helper with scale-aware defaults.

Local tests run on local[N]; the same config keys are what you would tune
on a 1000-executor cluster (AQE on, partition sizing, broadcast threshold).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "maha-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    # Python workers import maha_spark BY NAME (cloudpickle serializes
    # the pandas-UDF closures' module functions by reference), so the
    # package root must be importable ON THE WORKER, not just in the
    # driver's sys.path. A driver launched from outside the repo (sys.
    # path.insert without PYTHONPATH) would otherwise fail every UDF op
    # with ModuleNotFoundError. Local-mode workers inherit this process
    # env; on a real cluster the package ships as a wheel/--py-files and
    # this is a no-op.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root)
    return (
        SparkSession.builder
        .master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # /tmp may be reaped by the host while long benchmarks run, which
        # kills shuffle files mid-query; keep block-manager dirs local
        .config("spark.local.dir",
                os.environ.get("SPARK_LOCAL_DIRS",
                               os.path.join(os.path.dirname(
                                   os.path.dirname(os.path.abspath(__file__))),
                                   ".spark-tmp")))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
