#!/usr/bin/env python
"""Measured effect of the file-level data-skipping index on a needle
query at the 128x scaled tier (12.8M events rows, 30 dt= files):
``event_id = K`` via needle_scan (sidecar zone map prunes to the one
file whose [min,max] covers K) vs the plain full-scan filter. Writes
tools/bench_probes/skipdemo_r9.json."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def tmin(fn, passes=5):
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    from maha_spark.plans.skipping import (build_skipping_index,
                                           index_stale, needle_scan,
                                           prune_files)
    from maha_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("skipdemo", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    table = os.path.join(REPO, ".bench-scaled-sf0.1x128v7", "events")
    idx = os.path.join(REPO, ".bench-scaled-sf0.1x128v7",
                       "_skipidx", "events")
    t_build = time.perf_counter()
    if not os.path.exists(os.path.join(idx, "skip_event_id.parquet")) \
            or index_stale(table, idx, "event_id"):
        # stale (incl. a pre-format-change freshness record): rebuild,
        # or needle_scan would silently measure the full-scan fallback
        build_skipping_index(spark, table, ["event_id"], idx)
    t_build = round(time.perf_counter() - t_build, 2)

    needle = 9000
    full_df = spark.read.parquet(table)
    n_files = len({f for f in full_df.inputFiles()})
    kept = prune_files(spark, idx, "event_id", needle)

    # FRESH reads on both sides each pass: a needle workload does not
    # reuse a resolved FileIndex, so neither path may amortize listing
    def run_needle(t, ix):
        def go():
            needle_scan(spark, t, ix, "event_id", needle) \
                .write.format("noop").mode("overwrite").save()
        return go

    def run_full(t):
        def go():
            spark.read.parquet(t).filter(f"event_id = {needle}") \
                .write.format("noop").mode("overwrite").save()
        return go

    run_needle(table, idx)(); run_full(table)()   # warm (JIT + footers)
    out = {
        "rows": full_df.count(),
        "layout_files": n_files,
        "files_kept": len(kept),
        "index_build_s": t_build,
        "needle_s": tmin(run_needle(table, idx)),
        "full_scan_s": tmin(run_full(table)),
    }
    out["speedup"] = round(out["full_scan_s"] / out["needle_s"], 2)

    # the structural win grows with FILE COUNT: fragment the same rows
    # into ~20 files/day (600 total — the streaming-append shape before
    # compaction; real lakes run 10^4-10^6 files) and repeat
    frag = table + "_frag"
    if not os.path.exists(os.path.join(frag, "_FRAG_READY")):
        import shutil
        shutil.rmtree(frag, ignore_errors=True)
        (spark.read.parquet(table)
         .repartition(20).write.mode("overwrite")
         .option("maxRecordsPerFile", 25000)
         .partitionBy("dt").parquet(frag))
        open(os.path.join(frag, "_FRAG_READY"), "w").write("ok")
    fidx = idx + "_frag"
    if not os.path.exists(os.path.join(fidx, "skip_event_id.parquet")) \
            or index_stale(frag, fidx, "event_id"):
        build_skipping_index(spark, frag, ["event_id"], fidx)
    fkept = prune_files(spark, fidx, "event_id", needle)
    run_needle(frag, fidx)(); run_full(frag)()
    nf = len({f for f in spark.read.parquet(frag).inputFiles()})
    out["frag"] = {
        "layout_files": nf,
        "files_kept": len(fkept),
        "needle_s": tmin(run_needle(frag, fidx)),
        "full_scan_s": tmin(run_full(frag)),
    }
    out["frag"]["speedup"] = round(
        out["frag"]["full_scan_s"] / out["frag"]["needle_s"], 2)
    path = os.path.join(REPO, "tools", "bench_probes", "skipdemo_r9.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
