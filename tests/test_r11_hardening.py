"""Round-11 crash-safety hardening pins:

* ``update_exsub_index`` self-heals from a crash between its windows
  and sidecar appends (the ``_exsub_pending`` marker), and never
  creates an incomplete sidecar on a pre-sidecar index layout;
* ``compact_freq_partials`` survives a crash between the source remove
  and the temp-dir rename (temp-then-swap, versioning.py pattern);
* ``merge_freq_partials`` is total-preserving for residual-only grains
  (the outer-join fix);
* the ``_table_version`` stamp round-trips through the Hadoop
  FileSystem API for scheme-qualified table roots.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from maha_spark.core.freqitems import (freq_items_partial,
                                       merge_freq_partials)
from maha_spark.ops import substring
from maha_spark.plans.versioning import bump_table_version, table_version
from maha_spark.streaming.freq import compact_freq_partials


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _text(tag: str) -> str:
    return " ".join(f"{tag}{i}" for i in range(substring.EXSUB_L + 2))


def _sidecar_ids(spark, idx) -> set:
    return {r.doc_id for r in
            spark.read.parquet(substring._docs_path(idx)).collect()}


def _windows_doc_counts(spark, idx) -> dict:
    rows = (spark.read.parquet(substring._windows_path(idx))
            .groupBy("doc_id").count().collect())
    return {r.doc_id: r["count"] for r in rows}


# ------------------------------------------- exsub batch-path atomicity
def test_exsub_crash_between_appends_self_heals(spark, tmp_path,
                                                monkeypatch):
    """Kill the call between the windows append and the sidecar append
    (monkeypatched second _window_hashes), then show the NEXT batch
    call heals: the pending marker triggers a reconcile, the retried
    batch is loudly rejected (no silent double-count), and a fresh
    batch proceeds with the invariant restored."""
    idx = str(tmp_path / "idx")
    substring.materialize_exsub_index(
        spark, _docs(spark, [(i, _text(f"a{i}x")) for i in range(3)]), idx)
    batch2 = _docs(spark, [(10, _text("b")), (11, _text("c"))])

    real = substring._window_hashes
    calls = {"n": 0}

    def torn(docs, length):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash after windows append")
        return real(docs, length)

    monkeypatch.setattr(substring, "_window_hashes", torn)
    with pytest.raises(RuntimeError):
        substring.update_exsub_index(spark, idx, batch2)
    monkeypatch.setattr(substring, "_window_hashes", real)

    # torn state: batch2's windows landed, the sidecar did not, and the
    # in-progress marker survives the crash
    assert os.path.exists(substring._pending_path(idx))
    assert 10 not in _sidecar_ids(spark, idx)
    base_counts = _windows_doc_counts(spark, idx)
    assert 10 in base_counts

    # the RETRY self-heals: the marker forces a reconcile, after which
    # the probe sees batch2 as already indexed and refuses — the
    # alternative (a pass) would double-count every batch2 window
    with pytest.raises(ValueError, match="already indexed"):
        substring.update_exsub_index(spark, idx, batch2)
    assert not os.path.exists(substring._pending_path(idx))
    assert _windows_doc_counts(spark, idx) == base_counts
    assert 10 in _sidecar_ids(spark, idx)

    # a NEW batch proceeds normally on the healed index
    substring.update_exsub_index(spark, idx, _docs(spark,
                                                   [(20, _text("d"))]))
    assert not os.path.exists(substring._pending_path(idx))
    win_ids = set(_windows_doc_counts(spark, idx))
    assert _sidecar_ids(spark, idx) == win_ids and 20 in win_ids


def test_exsub_presidecar_layout_gets_full_sidecar(spark, tmp_path):
    """On a legacy (pre-sidecar) index layout, an update must reconcile
    the FULL sidecar from the windows table before its first sidecar
    append — appending only the batch's ids would create an incomplete
    sidecar whose probe passes previously indexed doc_ids (the ADVICE
    double-append bug)."""
    import shutil
    idx = str(tmp_path / "legacy")
    old = _docs(spark, [(i, _text(f"e{i}y")) for i in range(4)])
    substring.materialize_exsub_index(spark, old, idx)
    shutil.rmtree(substring._docs_path(idx))  # simulate legacy layout

    substring.update_exsub_index(spark, idx, _docs(spark,
                                                   [(30, _text("f"))]))
    assert _sidecar_ids(spark, idx) == {0, 1, 2, 3, 30}
    # the previously indexed ids are rejected again (they would have
    # slipped through an incomplete batch-only sidecar)
    with pytest.raises(ValueError, match="already indexed"):
        substring.update_exsub_index(spark, idx, old.limit(1))


# ------------------------------------------- freq compaction atomicity
def _freq_events(spark, vals):
    return spark.createDataFrame(
        [(dt.date(2024, 1, 1), str(v)) for v in vals],
        "day date, user_id string")


def test_compact_freq_partials_crash_swap_recovers(spark, tmp_path,
                                                   monkeypatch):
    """A crash between the source remove and the temp-dir rename leaves
    the complete merged table in ``.compact-tmp``; the next call
    finishes the swap before doing anything else and the serve sees the
    full mass."""
    pdir = str(tmp_path / "partials")
    for bid, vals in enumerate([[1, 1, 2], [1, 3, 3, 3]]):
        (freq_items_partial(_freq_events(spark, vals), ["day"], "user_id")
         .write.parquet(os.path.join(pdir, f"batch_id={bid}")))

    # the swap is routed through the Hadoop-FS gateway since the r12
    # object-store work (ops.common.fs_rename), so THAT is the seam to
    # sever — an os.rename patch no longer intercepts the rename
    def boom(_spark, src, dst):
        raise OSError("simulated crash before rename")

    from maha_spark.ops import common as ops_common
    monkeypatch.setattr(ops_common, "fs_rename", boom)
    with pytest.raises(OSError, match="simulated crash"):
        compact_freq_partials(spark, pdir)
    monkeypatch.undo()

    assert not os.path.isdir(pdir)          # the torn state
    assert os.path.isdir(pdir + ".compact-tmp")
    n = compact_freq_partials(spark, pdir)  # self-heals, then compacts
    assert n >= 1 and not os.path.isdir(pdir + ".compact-tmp")
    out = spark.read.parquet(pdir).select("day", "freq_items").collect()
    total = sum(r.freq_items.total for r in out)
    assert total == 7                        # no event lost or doubled
    items = {}
    for r in out:
        for k, v in r.freq_items["items"].items():
            items[k] = items.get(k, 0) + v
    assert items == {"1": 3, "2": 1, "3": 3}


def test_compact_freq_partials_crash_before_write_keeps_source(
        spark, tmp_path, monkeypatch):
    """A failure while writing the merged temp table leaves the source
    untouched; the stale temp dir is cleared on the next call."""
    pdir = str(tmp_path / "p2")
    (freq_items_partial(_freq_events(spark, [5, 5]), ["day"], "user_id")
     .write.parquet(os.path.join(pdir, "batch_id=0")))
    os.makedirs(pdir + ".compact-tmp/garbage")  # stale prior attempt
    n = compact_freq_partials(spark, pdir)
    assert n == 1
    out = spark.read.parquet(pdir).collect()
    assert sum(r.freq_items.total for r in out) == 2


# ------------------------------------------- merge total-preservation
def test_merge_preserves_residual_only_grain(spark):
    """A grain whose input partials all carry EMPTY items maps used to
    be dropped by the inner join (its others mass vanished); the merge
    must be total-preserving for any structurally valid partial."""
    schema = ("day date, freq_items struct<items:map<string,bigint>,"
              "others_total:bigint,others_max:bigint,total:bigint>")
    rows = [
        (dt.date(2024, 1, 1), ({}, 100, 10, 100)),       # residual-only
        (dt.date(2024, 1, 1), ({}, 40, 7, 40)),          # residual-only
        (dt.date(2024, 1, 2), ({"a": 5}, 0, 0, 5)),      # normal grain
    ]
    out = (merge_freq_partials(spark.createDataFrame(rows, schema),
                               ["day"])
           .collect())
    d1 = [r for r in out if r.day == dt.date(2024, 1, 1)]
    assert len(d1) == 1                       # one residual row, no kept
    p = d1[0].freq_items
    assert p["items"] == {} and p.total == 140
    assert p.others_total == 140 and p.others_max == 17  # 0 + (10 + 7)
    d2 = [r for r in out if r.day == dt.date(2024, 1, 2)]
    assert len(d2) == 1 and d2[0].freq_items["items"] == {"a": 5}
    assert d2[0].freq_items.total == 5


# ------------------------------------------- stamp via Hadoop FS
def test_table_version_stamp_roundtrip_over_uri(spark, tmp_path):
    """Scheme-qualified table roots route stamp I/O through the Hadoop
    FileSystem API — pinned over file:// (the one scheme the sandbox
    can serve), where the POSIX spelling of the same directory must see
    the stamp the URI spelling wrote."""
    d = tmp_path / "tbl"
    d.mkdir()
    uri = "file://" + str(d)
    v1 = bump_table_version(uri)
    assert v1 > 0
    assert abs(table_version(uri) - v1) < 1e-9
    v2 = bump_table_version(uri)
    assert v2 > v1
    # same stamp file, read through plain local I/O
    assert abs(table_version(str(d)) - v2) < 1e-9
    # and a local bump is visible through the URI spelling
    v3 = bump_table_version(str(d))
    assert v3 > v2 and abs(table_version(uri) - v3) < 1e-9


def test_table_version_uri_missing_root(spark, tmp_path):
    uri = "file://" + str(tmp_path / "nope")
    assert table_version(uri) == -1.0
    assert bump_table_version(uri) == -1.0


# ---------------------------------------- self-cogroup pruning hazard
def test_self_cogroup_ops_survive_count_only_consumers(spark, sf_dir):
    """Both sides of the block-pair cogroups derive from one frame;
    without fresh right-side aliases, a count()-shaped consumer lets
    the optimizer prune the right child's payload columns (shared
    attribute ids) and the pandas kernel crashes on a frame missing
    vec_id/embedding. Pin count == collect for both kernels."""
    from maha_spark.ops.common import load_table
    from maha_spark.ops.similarity import (PAIR_COS_T, cos_neighbor_stats,
                                           exact_cos_pairs)
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = exact_cos_pairs(emb, PAIR_COS_T)
    assert pairs.count() == len(pairs.collect())
    stats = cos_neighbor_stats(emb, PAIR_COS_T)
    assert stats.count() == len(stats.collect()) == emb.count()
