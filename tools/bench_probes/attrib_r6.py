#!/usr/bin/env python
"""Attribute the scaled-tier ratio trend (0.42@128x -> 0.54@256x ->
0.72@512x): decompose each engine's cost into fixed per-file/per-query
overhead vs row-linear throughput.

Probes, per multiplier tier (expects the .bench-scaled-sf0.1x{M}{ATTRIB_LAYOUT_V}
layouts to exist — run bench.py first):

  1. duck_files    — DuckDB full-scan agg over the 2499-file dt layout.
  2. duck_compact  — same query over a single compacted parquet file of
                     identical rows (isolates per-file open overhead).
  3. spark_disk    — Spark same agg, uncached parquet scan of the layout.
  4. spark_cache   — Spark same agg from the in-memory columnar cache
                     (what the bench's warm queries actually scan).

All timings are min-of-3. Output: one JSON blob to stdout and to
tools/bench_probes/attrib_r6.json with derived rows/sec so the linear
vs constant scaling of each term is directly readable.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

MULTS = (128, 256, 512)
PASSES = 3
#: scaled-layout version suffix (v3 at probe time; bench.py bumps it on
#: layout changes — pass the current one to re-run the probe)
LAYOUT_V = os.environ.get("ATTRIB_LAYOUT_V", "v5")

AGG = ("SELECT l_returnflag, l_linestatus, count(*) AS n, "
       "sum(l_quantity) AS sq, sum(l_extendedprice) AS se "
       "FROM {src} GROUP BY 1, 2")


def tmin(fn, passes=PASSES):
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    from maha_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("attrib-probe", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    out = {"cpus": cpus, "tiers": []}
    for mult in MULTS:
        lay = os.path.join(REPO,
                   f".bench-scaled-sf0.1x{mult}{LAYOUT_V}")
        li = os.path.join(lay, "lineitem")
        if not os.path.isdir(li):
            print(f"# missing layout {lay}, skipping", file=sys.stderr)
            continue
        nfiles = sum(len(fs) for _, _, fs in os.walk(li))
        dbytes = sum(os.path.getsize(os.path.join(r, f))
                     for r, _, fs in os.walk(li) for f in fs)

        con = duckdb.connect()
        con.execute(f"SET threads TO {cpus}")
        src = f"read_parquet('{li}/*/*.parquet', hive_partitioning=1)"
        rows = con.execute(f"SELECT count(*) FROM {src}").fetchone()[0]
        duck_files = tmin(lambda: con.execute(AGG.format(src=src)).fetchall())

        # compacted single file, identical rows (COPY preserves values;
        # dt column dropped — it is a layout artifact, not data)
        compact = os.path.join(lay, "_probe_lineitem_compact.parquet")
        if not os.path.exists(compact):
            con.execute(
                f"COPY (SELECT * EXCLUDE (dt) FROM {src}) TO '{compact}'"
                " (FORMAT PARQUET, ROW_GROUP_SIZE 1048576)")
        csrc = f"read_parquet('{compact}')"
        duck_compact = tmin(
            lambda: con.execute(AGG.format(src=csrc)).fetchall())
        con.close()

        sdf = spark.read.parquet(li)
        agg_cols = [F.count("*").alias("n"),
                    F.sum("l_quantity").alias("sq"),
                    F.sum("l_extendedprice").alias("se")]

        def run_spark(df):
            (df.groupBy("l_returnflag", "l_linestatus").agg(*agg_cols)
               .write.format("noop").mode("overwrite").save())

        spark_disk = tmin(lambda: run_spark(sdf))
        cdf = sdf.cache()
        cdf.count()  # materialize outside timing
        spark_cache = tmin(lambda: run_spark(cdf))
        cdf.unpersist()

        out["tiers"].append({
            "mult": mult, "rows": rows, "files": nfiles,
            "disk_mb": round(dbytes / 1e6, 1),
            "duck_files_s": duck_files, "duck_compact_s": duck_compact,
            "duck_per_file_overhead_ms":
                round((duck_files - duck_compact) / nfiles * 1e3, 3),
            "spark_disk_s": spark_disk, "spark_cache_s": spark_cache,
            "mrows_per_s": {
                "duck_files": round(rows / duck_files / 1e6, 1),
                "duck_compact": round(rows / duck_compact / 1e6, 1),
                "spark_disk": round(rows / spark_disk / 1e6, 1),
                "spark_cache": round(rows / spark_cache / 1e6, 1),
            },
        })
        print(f"# mult={mult} done", file=sys.stderr)

    blob = json.dumps(out, indent=1)
    with open(os.path.join(REPO, "tools/bench_probes/attrib_r6.json"),
              "w") as f:
        f.write(blob)
    print(blob)
    spark.stop()


if __name__ == "__main__":
    main()
