#!/usr/bin/env python
"""Benchmark harness: runs the headline contract queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes through the full semantic-layer engine (request JSON ->
RequestModel -> DataFrame plan) and is forced with a count()-style action so
the measured time includes scan + shuffle + aggregation, not plan building.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def guess_sf(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> None:
    from maha_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("maha-spark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once with the cheapest query so q1's
    # number isn't dominated by session start-up
    first = sorted(queries)[0]
    try:
        queries[first](spark, SF_DIR).limit(1).collect()
    except Exception:
        pass

    # two passes, report the min: the host occasionally stalls a single
    # query by 10-40s (GC / noisy neighbor); steady-state time is the
    # representative number for throughput comparison
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    for p in range(passes):
        for name in sorted(queries):
            if p > 0 and name.startswith("op_"):
                continue  # ops are long-running and stable; one pass
            fn = queries[name]
            t0 = time.perf_counter()
            try:
                df = fn(spark, SF_DIR)
                # noop sink materializes every output column; a bare count()
                # would let Catalyst prune the aggregate expressions away
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                timings[name] = round(min(timings.get(name, dt), dt), 4)
            except Exception as e:  # pragma: no cover - report, keep going
                timings[name] = -1.0
                print(f"# bench error {name}: {e}", file=sys.stderr)
    total = sum(v for v in timings.values() if v > 0)

    print(json.dumps({
        "metric": "contract_queries_total",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": guess_sf(SF_DIR),
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
