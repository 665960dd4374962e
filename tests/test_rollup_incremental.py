"""Incremental maintenance of the partitioned lineitem_daily rollup.

At 100 TB a materialized rollup is not rebuilt nightly: late-arriving or
restated fact data touches a handful of days, and
``refresh_lineitem_rollup`` re-aggregates ONLY that day range from the
(partition-pruned) raw scan, dynamically overwriting just those ``dt=``
directories. These tests pin:

1. a refresh over stale/missing day partitions restores the table to a
   bit-identical copy of a full rebuild;
2. day partitions OUTSIDE the refreshed range are physically untouched
   (same files, same mtimes — no full-table rewrite hiding behind the
   API);
3. a refresh over a range with no raw rows changes nothing;
4. the Hive-partitioned rollup layout is selected and served by the
   engine exactly like the flat layout (same request, same values, same
   candidate).

Reference parity: maha's Druid facts get day-scoped restatement from
segment replacement (reindexing a day swaps that segment); the dynamic
partition overwrite is the parquet-warehouse equivalent.
"""

from __future__ import annotations

import os
import shutil

import pytest

from maha_spark.engine import engine_for_dir
from maha_spark.examples.contract import (
    build_contract_registry, materialize_lineitem_rollup,
    refresh_lineitem_rollup,
)

SRC = "/root/testdata/sf0.001"

LI_Q1 = {
    "cube": "tpch",
    "selectFields": [
        {"field": "return_flag"}, {"field": "line_status"},
        {"field": "sum_qty"}, {"field": "revenue"}, {"field": "charge"},
        {"field": "avg_qty"}, {"field": "avg_price"}, {"field": "avg_disc"},
        {"field": "line_count"}],
    "filterExpressions": [{"field": "day", "operator": "between",
                           "from": "1995-01-01", "to": "2002-12-31"}],
}


def _rows(spark, root):
    df = spark.read.parquet(os.path.join(root, "lineitem_daily"))
    # grain keys lead so sorting never compares a nullable partial
    # (ret_qty_dec is NULL for day-groups with no returns)
    keys = ["dt", "l_returnflag", "l_linestatus"]
    cols = keys + sorted(c for c in df.columns if c not in keys)
    return sorted(map(tuple, df.select(*cols).collect()),
                  key=lambda r: r[:3])


def _dir_state(d):
    return sorted((f, os.path.getmtime(os.path.join(d, f)))
                  for f in os.listdir(d))


@pytest.fixture(scope="module")
def pristine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("li_inc_full"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    materialize_lineitem_rollup(spark, SRC, d, partitioned=True)
    return d


@pytest.mark.slow
def test_refresh_restores_corrupted_days_bit_identically(
        spark, pristine, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("li_inc_work"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(work, t))
    materialize_lineitem_rollup(spark, SRC, work, partitioned=True)
    roll = os.path.join(work, "lineitem_daily")
    days = sorted(e for e in os.listdir(roll) if e.startswith("dt="))
    assert len(days) > 20
    # simulate restatement damage across a 3-day window: one day's
    # partition deleted outright, one rewritten with ANOTHER day's rows
    # (stale values), one left intact (the refresh range may span
    # undamaged days — they are rewritten identically)
    d0, d1, d2 = days[10], days[11], days[12]
    shutil.rmtree(os.path.join(roll, d0))
    shutil.rmtree(os.path.join(roll, d1))
    shutil.copytree(os.path.join(roll, days[40]), os.path.join(roll, d1))
    assert _rows(spark, work) != _rows(spark, pristine)

    untouched = os.path.join(roll, days[5])
    before = _dir_state(untouched)
    refresh_lineitem_rollup(spark, SRC, work,
                            d0.split("=")[1], d2.split("=")[1])
    assert _rows(spark, work) == _rows(spark, pristine)
    # days outside the range: same files, same mtimes — the refresh did
    # not silently rewrite the whole table
    assert _dir_state(untouched) == before


@pytest.mark.slow
def test_refresh_of_empty_range_is_a_noop(spark, pristine, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("li_inc_noop"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(work, t))
    materialize_lineitem_rollup(spark, SRC, work, partitioned=True)
    before = _rows(spark, work)
    # no raw rows ship in 1990: dynamic overwrite with an empty frame
    # must touch nothing
    refresh_lineitem_rollup(spark, SRC, work, "1990-01-01", "1990-01-31")
    assert _rows(spark, work) == before


def test_partitioned_rollup_serves_like_flat(spark, pristine):
    """Candidate selection + values are layout-independent: the engine
    picks lineitem_daily from the Hive-partitioned directory and returns
    the same rows as the raw plan."""
    raw = engine_for_dir(spark, build_contract_registry(), SRC)
    rolled = engine_for_dir(spark, build_contract_registry(), pristine)
    assert rolled.model(LI_Q1).fact_table.name == "lineitem_daily"
    a = sorted(map(tuple, raw.dataframe(LI_Q1).collect()))
    b = sorted(map(tuple, rolled.dataframe(LI_Q1).collect()))
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_nation_rollup_refresh_restores_bit_identically(
        spark, tmp_path_factory):
    """The aggregate-join rollup gets the same restatement guarantee:
    refreshing a damaged day range re-joins orders/customer for only
    those days and restores the table to a bit-identical copy of a full
    rebuild, leaving out-of-range partitions physically untouched."""
    from maha_spark.examples.contract import (
        materialize_lineitem_nation_rollup, refresh_lineitem_nation_rollup)

    def build(name):
        d = str(tmp_path_factory.mktemp(name))
        for t in os.listdir(SRC):
            os.symlink(os.path.join(SRC, t), os.path.join(d, t))
        materialize_lineitem_nation_rollup(spark, SRC, d, partitioned=True)
        return d

    def rows(root):
        df = spark.read.parquet(os.path.join(root, "lineitem_daily_nation"))
        keys = ["dt", "cust_nation_fk"]
        cols = keys + sorted(c for c in df.columns if c not in keys)
        return sorted(map(tuple, df.select(*cols).collect()),
                      key=lambda r: r[:2])

    pristine, work = build("nat_full"), build("nat_work")
    roll = os.path.join(work, "lineitem_daily_nation")
    days = sorted(e for e in os.listdir(roll) if e.startswith("dt="))
    d0, d1 = days[15], days[16]
    shutil.rmtree(os.path.join(roll, d0))
    shutil.rmtree(os.path.join(roll, d1))
    shutil.copytree(os.path.join(roll, days[50]), os.path.join(roll, d1))
    assert rows(work) != rows(pristine)

    untouched = os.path.join(roll, days[5])
    before = _dir_state(untouched)
    refresh_lineitem_nation_rollup(spark, SRC, work,
                                   d0.split("=")[1], d1.split("=")[1])
    assert rows(work) == rows(pristine)
    assert _dir_state(untouched) == before
