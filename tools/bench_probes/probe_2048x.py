#!/usr/bin/env python
"""Round-8 trend guard: one more doubling of the scaled tier (2048x =
~1.23B lineitem rows) over the current bench layout (v8 — adds the l_orderkey skipping sidecar, r10; the committed
round-8 measurement `2048x_v6.json` ran on v6 — identical for every
scaled query, v7 only adds the events_hourly histogram column), checking
that the flat ratio trend [128x 0.159, 256x 0.175, 512x 0.198,
1024x 0.168] holds (q6 dim-driven is the watch item — parity by design
per README "Scaled-ratio trend").

Writes tools/bench_probes/{MULT}x_v7.json and prints it.
Usage: python tools/bench_probes/probe_2048x.py  (~15 min first build)
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

MULT = int(os.environ.get("PROBE_MULT", "2048"))
PASSES = int(os.environ.get("PROBE_PASSES", "3"))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    bench = _load("bench", os.path.join(REPO, "bench.py"))
    entry = _load("entry", os.path.join(REPO, "__spark_entry__.py"))

    from maha_spark.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("probe-2048x", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    queries, oracles = entry.queries(), entry.oracle_sql()
    # r9 rotation: q3/q11 live off-contract now — resolve them from the
    # off-contract registry so the trend stays comparable across rounds
    from maha_spark.examples import contract as _contract
    for _n in bench.SCALED_QUERIES:
        if _n not in queries and _n in _contract.OFFCONTRACT_QUERIES:
            queries[_n] = (lambda name: lambda sp, d:
                           _contract.run_query(sp, d, name))(_n)
            oracles[_n] = _contract.OFFCONTRACT_QUERIES[_n]["sql"]
    s_names = [n for n in bench.SCALED_QUERIES if n in queries]

    sdir = bench.ensure_scaled_dir(spark, bench.SF_DIR, MULT)
    # warm pass: fact caches + JIT before any timed pass
    for n in s_names:
        try:
            queries[n](spark, sdir).write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass
    sp = bench.time_spark(queries, s_names, spark, sdir, passes=PASSES)

    con = bench.duck_connect(sdir)
    rows = con.execute("SELECT count(*) FROM lineitem").fetchone()[0]
    du = bench.time_duckdb(oracles, s_names, con, passes=PASSES)
    con.close()

    # aggregate over queries BOTH engines timed successfully — a failed/
    # zero timing on either side drops the query from both sums, never
    # inflating or crashing the ratio
    ok = [n for n in s_names if sp.get(n, 0) > 0 and du.get(n, 0) > 0]
    out = {
        "mult": MULT, "rows": rows, "cpus": cpus, "passes": PASSES,
        "spark_s": sp, "duck_dt_s": du,
        "ratio_per_query": {
            n: (round(sp[n] / du[n], 3) if n in ok else None)
            for n in s_names},
        "ratio_aggregate": (round(sum(sp[n] for n in ok)
                                  / sum(du[n] for n in ok), 3)
                            if ok else None),
        "excluded": [n for n in s_names if n not in ok],
        # Spark-only throughput needs no DuckDB denominator — keep every
        # query Spark actually timed
        "mrows_s": {n: round(rows / sp[n] / 1e6, 1)
                    for n in s_names if sp.get(n, 0) > 0},
    }
    dst = os.path.join(REPO, "tools", "bench_probes", f"{MULT}x_v8.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
