"""Structural profile of contract entries: per-entry wall time AND
driver-job / stage counts per pass (via per-pass job groups). Job and
stage counts are deterministic — they do not move with host contention —
so they are the right target metric for serialized-driver-round-trip
optimization (guide §1.2 / §5 "the driver should do almost no work").

Usage: python tools/op_jobs.py [entry ...]   (default: every op_*)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import __spark_entry__ as entrymod
    from maha_spark.ops.common import release_scoped_caches
    from maha_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("op-jobs", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = sys.argv[1:] or sorted(
        n for n in queries if n.startswith("op_")
        and not n.startswith("op_stream"))
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in names:
        row = [name]
        for tag in ("cold", "warm"):
            group = f"{name}-{tag}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                queries[name](spark, SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                print(f"{name}: ERROR {e}")
                dt = -1.0
            jids = tracker.getJobIdsForGroup(group)
            nstages = sum(
                len(tracker.getJobInfo(j).stageIds) for j in jids
                if tracker.getJobInfo(j) is not None)
            row.append(f"{tag}: {dt:6.2f}s jobs={len(jids):3d} "
                       f"stages={nstages:3d}")
        release_scoped_caches()
        print("  ".join(row), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
