#!/usr/bin/env python
"""Round-7 probes, two judge asks in one run:

1. ATTRIBUTE q2/q11 at the deep tiers. Both queries aggregate the FULL
   row-multiplied fact by l_partkey (20k groups at sf0.1) — no dim join
   at all — so the rising ratio can only come from (a) DuckDB's
   denominator amortizing fixed per-file cost (the r6 finding for q1)
   or (b) a real Spark-side aggregation cost. The probe times each
   query on both engines over the dt layout AND over a compacted
   single-file copy of identical rows (isolating DuckDB's per-file
   overhead), min-of-N each.

2. 1024x TIER: the full scaled-query set on both engines at 614M fact
   rows, extending the ratio trend one more doubling with the
   row-count-gated cache (614M >> 200M -> parquet streaming, never the
   in-memory columnar scan). The compact-file DuckDB time is reported
   alongside as the honest throughput denominator.

Writes tools/bench_probes/attrib_r7.json and prints it.
Usage: python tools/bench_probes/attrib_r7.py   (builds/reuses the
.bench-scaled-sf0.1x{512,1024}v5 layouts; ~10 min first build of 1024x)
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

MULTS = tuple(int(m) for m in
              os.environ.get("ATTRIB_MULTS", "512,1024").split(","))
PASSES = 3
ATTRIB_QUERIES = ("q2_topn_parts", "q11_having")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def tmin(fn, passes=PASSES):
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    import duckdb

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    bench = _load("bench", os.path.join(REPO, "bench.py"))
    entry = _load("entry", os.path.join(REPO, "__spark_entry__.py"))

    from maha_spark.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("attrib-r7", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    queries, oracles = entry.queries(), entry.oracle_sql()
    s_names = [n for n in bench.SCALED_QUERIES if n in queries]

    out = {"cpus": cpus, "passes": PASSES, "tiers": []}
    for mult in MULTS:
        sdir = bench.ensure_scaled_dir(spark, bench.SF_DIR, mult)
        li = os.path.join(sdir, "lineitem")
        nfiles = sum(len(fs) for _, _, fs in os.walk(li))

        # warm pass (JIT + FileIndex), then timed
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

        # compacted single-file lineitem: same rows, no per-file overhead
        compact = os.path.join(sdir, "_probe_lineitem_compact.parquet")
        if not os.path.exists(compact):
            con.execute(
                "COPY (SELECT * EXCLUDE (dt) FROM lineitem) TO "
                f"'{compact}' (FORMAT PARQUET, ROW_GROUP_SIZE 1048576)")
        con.close()
        ccon = bench.duck_connect(sdir)
        ccon.execute("DROP VIEW lineitem")
        ccon.execute("CREATE VIEW lineitem AS SELECT * FROM "
                     f"read_parquet('{compact}')")
        duc = bench.time_duckdb(oracles, list(ATTRIB_QUERIES) +
                                ["q1_pricing_summary"], ccon, passes=PASSES)
        ccon.close()

        tier = {
            "mult": mult, "rows": rows, "files": nfiles,
            "spark_s": sp, "duck_dt_s": du, "duck_compact_s": duc,
            "ratio_per_query": {
                n: (round(sp[n] / du[n], 3) if du.get(n, 0) > 0 else None)
                for n in s_names},
            "ratio_aggregate": round(
                sum(sp.values()) / sum(du.values()), 3),
            "attrib": {
                n: {
                    "spark_mrows_s": round(rows / sp[n] / 1e6, 1),
                    "duck_dt_mrows_s": round(rows / du[n] / 1e6, 1),
                    "duck_compact_mrows_s": round(rows / duc[n] / 1e6, 1),
                    "duck_file_overhead_s": round(du[n] - duc[n], 3),
                    "ratio_vs_compact": round(sp[n] / duc[n], 3),
                } for n in ATTRIB_QUERIES},
        }
        out["tiers"].append(tier)
        print(f"# mult={mult}: agg ratio {tier['ratio_aggregate']}",
              file=sys.stderr)

    blob = json.dumps(out, indent=1)
    with open(os.path.join(REPO, "tools/bench_probes/attrib_r7.json"),
              "w") as f:
        f.write(blob)
    print(blob)
    spark.stop()


if __name__ == "__main__":
    main()
