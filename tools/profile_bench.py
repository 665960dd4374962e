"""Profile the scaled bench tier: engine-layer overhead vs raw Spark vs
DuckDB for the headline queries.

Usage: python tools/profile_bench.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def t(fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import __spark_entry__ as entrymod
    from maha_spark.session import get_spark

    names = sys.argv[1:] or ["q1_pricing_summary"]
    spark = get_spark("profile", master=f"local[{bench.CPUS}]",
                      shuffle_partitions=max(bench.CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdir = bench.ensure_scaled_dir(spark, bench.SF_DIR, bench.MULT)
    print("scaled dir:", sdir)

    # raw spark floor: hand-written q1 equivalent, no engine layer
    li = spark.read.parquet(os.path.join(sdir, "lineitem.parquet"))
    from pyspark.sql import functions as F

    def raw_q1():
        (li.groupBy("l_returnflag", "l_linestatus")
         .agg(F.sum("l_quantity").alias("sq"),
              F.sum("l_extendedprice").alias("sp"),
              F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
              F.count(F.lit(1)).alias("n"))
         .write.format("noop").mode("overwrite").save())

    raw_q1()
    print(f"raw spark q1 (double arith): {t(raw_q1):.3f}s")
    print("lineitem rows:", li.count())

    con = bench.duck_connect(sdir)
    for name in names:
        fn = queries[name]
        fn(spark, sdir).write.format("noop").mode("overwrite").save()  # warm

        def run():
            fn(spark, sdir).write.format("noop").mode("overwrite").save()

        def plan_only():
            fn(spark, sdir)

        sp = t(run)
        po = t(plan_only)
        du = t(lambda: con.execute(oracles[name]).fetchall()) \
            if name in oracles else -1
        print(f"{name}: spark {sp:.3f}s (plan {po:.3f}s) "
              f"duckdb {du:.3f}s ratio {sp / du if du > 0 else -1:.1f}")
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
