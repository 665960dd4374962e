#!/usr/bin/env python
"""Measured effect of Z-ORDER clustering + the skipping sidecar on
multi-column needle queries, at the 128x tier's fragmented events
layout (12.8M rows, 600 files — the streaming-append shape skipdemo_r9
uses). Three layouts, same rows:

* frag        — unclustered (repartition-scrambled) baseline
* zorder      — zorder_day_partitions on (event_id, user_id)
* event-sort  — single-column sort leader (event_id), the pre-Z answer

For each: needle `event_id = K` and `user_id = K` via needle_scan,
files kept + min wall-clock over passes, vs the full-scan filter.
Writes tools/bench_probes/zorderdemo_r9.json."""

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
    from pyspark.sql import functions as F

    from maha_spark.plans.scale import (overwrite_day_partitions,
                                        zorder_day_partitions)
    from maha_spark.plans.skipping import (build_skipping_index,
                                           index_stale, needle_scan,
                                           prune_files)
    from maha_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("zorderdemo", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    base = os.path.join(REPO, ".bench-scaled-sf0.1x128v7")
    frag = os.path.join(base, "events_frag")
    if not os.path.exists(os.path.join(frag, "_FRAG_READY")):
        raise SystemExit("run skipdemo_r9.py first (builds events_frag)")

    cols = ["event_id", "user_id"]
    layouts = {"frag": frag}

    # matched granularity across layouts (same records-per-file cap)
    # so kept-file ratios and scan times compare apples-to-apples
    from maha_spark.plans.scale import zorder_expr

    zo = frag + "_zorder"
    if not os.path.exists(os.path.join(zo, "_READY")):
        import shutil
        shutil.rmtree(zo, ignore_errors=True)
        src = spark.read.parquet(frag).localCheckpoint(eager=True)
        z = zorder_expr(src, cols)
        overwrite_day_partitions(src, zo, max_records_per_file=25000,
                                 sort_within=[z])
        open(os.path.join(zo, "_READY"), "w").write("ok")
    layouts["zorder"] = zo

    es = frag + "_esort"
    if not os.path.exists(os.path.join(es, "_READY")):
        import shutil
        shutil.rmtree(es, ignore_errors=True)
        src = spark.read.parquet(frag).localCheckpoint(eager=True)
        overwrite_day_partitions(src, es, max_records_per_file=25000,
                                 sort_within=[F.col("event_id")])
        open(os.path.join(es, "_READY"), "w").write("ok")
    layouts["event_sort"] = es

    # needles that exist in the data
    row = spark.read.parquet(frag).select("event_id", "user_id").first()
    needles = {"event_id": int(row["event_id"]),
               "user_id": int(row["user_id"])}

    out: dict = {"rows": spark.read.parquet(frag).count(),
                 "needles": needles}
    for name, path in layouts.items():
        idx = os.path.join(base, "_skipidx",
                           f"zdemo_{os.path.basename(path)}")
        if not os.path.exists(os.path.join(idx, "skip_event_id.parquet")) \
                or any(index_stale(path, idx, c) for c in cols):
            # stale (layout rebuilt under an existing index): rebuild, or
            # needle_scan would silently measure the full-scan fallback
            build_skipping_index(spark, path, cols, idx)
        nf = len({f for f in spark.read.parquet(path).inputFiles()})
        entry: dict = {"layout_files": nf}
        for col, needle in needles.items():
            kept = prune_files(spark, idx, col, needle)

            def run_needle():
                needle_scan(spark, path, idx, col, needle) \
                    .write.format("noop").mode("overwrite").save()

            def run_full():
                spark.read.parquet(path) \
                    .filter(F.col(col) == needle) \
                    .write.format("noop").mode("overwrite").save()

            run_needle(); run_full()        # warm (JIT + footers)
            needle_s = tmin(run_needle)
            full_s = tmin(run_full)
            entry[col] = {"files_kept": len(kept),
                          "needle_s": needle_s, "full_scan_s": full_s,
                          "speedup": round(full_s / needle_s, 2)}
        out[name] = entry

    p = os.path.join(REPO, "tools", "bench_probes", "zorderdemo_r9.json")
    with open(p, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
