"""End-to-end composed maintenance (plans/maintenance.py): ONE entry
point runs rollup refresh -> sidecar build/refresh -> frequent-items
compaction -> ExactSubstr index compaction on a day restatement, under
the ``_table_version`` stamp contract. Pins:

1. the restated rollup days are restored bit-identically to the full
   build, read back THROUGH the binding (so the stamp, not luck,
   invalidates the DataFrame memo);
2. the ledger-mined sidecar leg builds the dim-driven driving-FK
   sidecar (q6-shaped traffic -> lineitem.l_orderkey) as part of the
   cycle;
3. the compacted freq-partials table serves the same mass/items as the
   uncompacted one, and equals a STANDALONE compaction of an identical
   copy;
4. the compacted ExactSubstr index holds the same window-row multiset
   as before compaction, in fewer files, with the doc sidecar
   reconciled;
5. every rewritten artifact's ``_table_version`` advanced (the report
   exposes the post-cycle stamps for scheduler alerting).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys

import pytest

# soak-style end-to-end suites (their session fixtures alone cost ~25 s):
# slow tail, excluded from the default run (see pyproject.toml)
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.core.freqitems import freq_items_partial  # noqa: E402
from maha_spark.engine import engine_for_dir  # noqa: E402
from maha_spark.examples.contract import build_contract_registry  # noqa: E402
from maha_spark.ops import substring  # noqa: E402
from maha_spark.plans.maintenance import run_maintenance_cycle  # noqa: E402
from maha_spark.plans.versioning import table_version  # noqa: E402
from maha_spark.registry.advisor import (_NdvProbe,  # noqa: E402
                                         recommend_rollups)
from maha_spark.registry.materializer import (  # noqa: E402
    materialize_recommendation)
from maha_spark.streaming.freq import compact_freq_partials  # noqa: E402

SRC = "/root/testdata/sf0.001"


def _req(fields):
    return json.dumps({
        "cube": "tpch",
        "selectFields": [{"field": f} for f in fields],
        "filterExpressions": [{"field": "day", "operator": "between",
                               "from": "1995-01-01", "to": "2001-12-31"}]})


DIM_DRIVEN = json.dumps({
    "cube": "tpch",
    "selectFields": [{"field": "order_key"}, {"field": "order_priority"},
                     {"field": "revenue"}],
    "filterExpressions": [{"field": "day", "operator": "between",
                           "from": "1995-01-01", "to": "2002-12-31"}],
    "sortBy": [{"field": "order_priority", "order": "ASC"}],
    "forceDimensionDriven": True,
    "rowsPerPage": 25,
})


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _text(tag):
    return " ".join(f"{tag}{i}" for i in range(substring.EXSUB_L + 2))


def _freq_events(spark, vals):
    return spark.createDataFrame(
        [(dt.date(2024, 1, 1), str(v)) for v in vals],
        "day date, user_id string")


def _rows(spark, path):
    df = spark.read.parquet(path)
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()),
                  key=lambda r: tuple((v is None, str(v)) for v in r))


@pytest.fixture(scope="module")
def cycle(spark, tmp_path_factory):
    """Stage all four artifact kinds, restate a rollup day, run ONE
    run_maintenance_cycle, and hand the results to the pins."""
    work = str(tmp_path_factory.mktemp("mcycle"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(work, t))
    reg = build_contract_registry()
    eng = engine_for_dir(spark, reg, work)

    # ---- rollup: advisor rec, materialized partitioned, then restated
    logs = ([_req(["nation_name", "revenue"])] * 5
            + [_req(["nation_name", "market_segment", "revenue"])] * 3)
    probe = _NdvProbe.fixed(
        rows={"lineitem": 600_000_000, "orders": 150_000_000,
              "customer": 15_000_000, "nation": 25, "region": 5},
        ndvs={("lineitem", "l_shipdate"): 2500,
              ("customer", "c_mktsegment"): 5,
              ("nation", "n_name"): 25, ("region", "r_name"): 5})
    rec = recommend_rollups(eng, logs, top_n=3, probe=probe)[0]
    cube = reg.fact("tpch")
    roll = materialize_recommendation(spark, eng.binding, reg, cube, rec,
                                      work, "mroll", partitioned=True)
    full = _rows(spark, roll)
    days = sorted(f.split("=", 1)[1] for f in os.listdir(roll)
                  if f.startswith("dt="))
    lo, hi = days[2], days[3]
    shutil.rmtree(os.path.join(roll, f"dt={lo}"))        # lost day
    victim = os.path.join(roll, f"dt={hi}")              # truncated day
    for f in os.listdir(victim):
        os.unlink(os.path.join(victim, f))
    roll_v0 = table_version(roll)

    # ---- freq partials: two streamed batches + an identical copy for
    # the standalone-compaction bit-identity pin
    pdir = os.path.join(work, "freq_partials")
    for bid, vals in enumerate([[1, 1, 2], [1, 3, 3, 3]]):
        (freq_items_partial(_freq_events(spark, vals), ["day"], "user_id")
         .write.parquet(os.path.join(pdir, f"batch_id={bid}")))
    pcopy = pdir + "_copy"
    shutil.copytree(pdir, pcopy)
    freq_v0 = table_version(pdir)

    # ---- exsub index: materialize + 8 fragmenting appends
    idx = os.path.join(work, "exsub_idx")
    substring.materialize_exsub_index(
        spark, _docs(spark, [(0, _text("base"))]), idx)
    for i in range(1, 9):
        substring.update_exsub_index(
            spark, idx, _docs(spark, [(i, _text(f"b{i}x"))]),
            assume_new=True)
    wpath = substring._windows_path(idx)
    files_before = len([f for f in os.listdir(wpath)
                        if f.endswith(".parquet")])
    windows_before = _rows(spark, wpath)
    idx_v0 = table_version(idx)

    report = run_maintenance_cycle(
        spark, engine=eng,
        rollups=[{"cube": "tpch", "rec": rec, "dst_dir": work,
                  "name": "mroll", "from_day": lo, "to_day": hi}],
        ledger_entries=[DIM_DRIVEN] * 3, skip_base_dir=work,
        freq_partials=[pdir], exsub_indexes=[idx],
        compact_target_mb=64)
    return {"work": work, "eng": eng, "roll": roll, "full": full,
            "pdir": pdir, "pcopy": pcopy, "idx": idx,
            "files_before": files_before,
            "windows_before": windows_before, "report": report,
            "v0": {"roll": roll_v0, "freq": freq_v0, "idx": idx_v0}}


def test_rollup_restored_bit_identical_through_binding(spark, cycle):
    assert _rows(spark, cycle["roll"]) == cycle["full"]
    # through the binding: the memo is keyed on _table_version, so this
    # only sees the restored rows because the refresh bumped the stamp
    bound = cycle["eng"].binding.table("mroll")
    assert bound.count() == len(cycle["full"])


def test_dim_driven_sidecar_built_by_cycle(cycle):
    report = cycle["report"]
    assert "lineitem" in report["sidecars"]
    built = report["sidecars"]["lineitem"]
    assert built and all(os.path.exists(p) for p in built)
    assert any("l_orderkey" in p for p in built)


def test_freq_compaction_matches_standalone(spark, cycle):
    got = spark.read.parquet(cycle["pdir"]).select("day", "freq_items")
    # standalone compaction of the identical copy
    compact_freq_partials(spark, cycle["pcopy"])
    want = spark.read.parquet(cycle["pcopy"]).select("day", "freq_items")
    assert sorted(map(str, got.collect())) == sorted(map(str,
                                                         want.collect()))
    assert cycle["report"]["freq"][cycle["pdir"]] >= 1
    total = sum(r.freq_items.total for r in got.collect())
    assert total == 7


def test_exsub_compaction_row_multiset_unchanged(spark, cycle):
    wpath = substring._windows_path(cycle["idx"])
    files_after = len([f for f in os.listdir(wpath)
                       if f.endswith(".parquet")])
    assert cycle["report"]["exsub"][cycle["idx"]] > 0
    assert files_after < cycle["files_before"]
    assert _rows(spark, wpath) == cycle["windows_before"]
    # doc sidecar reconciled == distinct windows doc_ids
    side = {r.doc_id for r in spark.read.parquet(
        substring._docs_path(cycle["idx"])).collect()}
    assert side == set(range(9))


def test_every_rewritten_artifact_stamp_advanced(cycle):
    rep, v0 = cycle["report"], cycle["v0"]
    assert rep["versions"][cycle["roll"]] > max(v0["roll"], 0.0)
    assert rep["versions"][cycle["pdir"]] > max(v0["freq"], 0.0)
    assert rep["versions"][cycle["idx"]] > max(v0["idx"], 0.0)
