"""Local replica of the driver's correctness gate: run each entry in
``__spark_entry__.queries()`` and its ``oracle_sql()`` side-by-side on the
same parquet dir and compare row count, schema (column names), and a
value hash over column-name-sorted, row-sorted values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time


def _norm_cell(v):
    import datetime as _dt
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    # DuckDB fetchdf maps DATE to midnight Timestamps while Spark yields
    # datetime.date — normalize midnight-exact values to the date string
    if isinstance(v, _dt.datetime):
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def _frame_sig(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None))
    import hashlib
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return cols, len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import duckdb
    import __spark_entry__ as entry

    if os.environ.get("ORACLE_CHECK_VANILLA") == "1":
        # driver-parity mode: a bare default session (1g driver, 200
        # shuffle partitions, no tz/AQE overrides) — what the harness
        # most plausibly runs entries under
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .appName("oracle-check-vanilla").getOrCreate())
    else:
        from maha_spark.session import get_spark
        spark = get_spark("oracle-check")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, "
                  f"{t_spark:.2f}s, no oracle)")
            continue
        t0 = time.time()
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            failures += 1
            continue
        t_duck = time.time() - t0
        s_cols, s_n, s_h = _frame_sig(sdf)
        o_cols, o_n, o_h = _frame_sig(odf)
        ok = (s_cols == o_cols) and (s_n == o_n) and (s_h == o_h)
        if ok:
            print(f"PASS {name}: {s_n} rows "
                  f"(spark {t_spark:.2f}s, duckdb {t_duck:.2f}s)")
        else:
            failures += 1
            print(f"FAIL {name}: spark({s_n} rows, cols={s_cols}, "
                  f"hash={s_h[:8]}) vs oracle({o_n} rows, cols={o_cols}, "
                  f"hash={o_h[:8]})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
