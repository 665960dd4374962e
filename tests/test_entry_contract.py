"""Simulates the driver's t2 correctness gate: run every queries() entry
and its oracle_sql() side-by-side, compare row count + column names +
exact values (order-insensitive)."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def normalize(rows, ndigits=9):
    import datetime
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                # exact-match expected; round only to absorb repr noise.
                # NULL metrics arrive as NaN via pandas on both sides —
                # fold to None so equal rows compare equal (nan != nan)
                vals.append(None if v != v else round(v, ndigits))
            elif isinstance(v, datetime.datetime):
                # DuckDB DATE arrives as midnight Timestamp via pandas;
                # fold back to a date so it matches Spark's DateType
                vals.append(v.date().isoformat() if (
                    v.hour == v.minute == v.second == v.microsecond == 0)
                    else v.isoformat())
            elif isinstance(v, datetime.date):
                vals.append(v.isoformat())
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    sdf = df.toPandas()
    ddf = duck.execute(ORACLES[name]).df()
    assert sorted(c.lower() for c in sdf.columns) == \
        sorted(c.lower() for c in ddf.columns), \
        f"columns differ: {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    # align column order by name
    sdf = sdf[sorted(sdf.columns, key=str.lower)]
    ddf.columns = list(ddf.columns)
    ddf = ddf[sorted(ddf.columns, key=str.lower)]
    assert len(sdf) == len(ddf), f"rows {len(sdf)} vs {len(ddf)}"
    s_rows = normalize(sdf.itertuples(index=False, name=None))
    d_rows = normalize(ddf.itertuples(index=False, name=None))
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name} row {i}: {a} vs {b}"
            else:
                assert str(x) == str(y), f"{name} row {i}: {a} vs {b}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) == 10
