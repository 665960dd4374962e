"""Explicit table-version stamps (``plans/versioning.py``) — the
object-store-safe invalidation contract behind the binding DataFrame
memo, the skipping sidecar staleness gate, and the result-level cache.

The stamp-only tests shim out POSIX directory mtime entirely
(``getmtime`` raises, ``utime`` raises — the S3/ABFS/GCS shape) and
assert every layer still invalidates through the ``_table_version``
stamp alone."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.plans import versioning  # noqa: E402
from maha_spark.plans.scale import overwrite_day_partitions  # noqa: E402
from maha_spark.plans.versioning import (VERSION_FILE,  # noqa: E402
                                         bump_table_version, table_version)


def _mk_table(spark, path, mod=0):
    rows = [(i, f"2000-01-0{1 + i % 3}", i * 10 + mod) for i in range(30)]
    df = spark.createDataFrame(rows, "id INT, dt STRING, v INT")
    overwrite_day_partitions(df, path)


# ------------------------------------------------- stamp mechanics
def test_stamp_written_and_monotonic(spark, tmp_path):
    t = str(tmp_path / "t1")
    _mk_table(spark, t)
    assert os.path.exists(os.path.join(t, VERSION_FILE))
    v1 = table_version(t)
    assert v1 > 0
    _mk_table(spark, t, mod=1)
    v2 = table_version(t)
    assert v2 > v1
    # explicit bump strictly increases even with a frozen clock
    v3 = bump_table_version(t)
    v4 = bump_table_version(t)
    assert table_version(t) == v4 > v3 > v2


def test_fallback_to_mtime_and_missing_path(tmp_path):
    plain = str(tmp_path / "never_stamped")
    os.makedirs(plain)
    assert table_version(plain) == os.path.getmtime(plain)
    assert table_version(str(tmp_path / "nope")) == -1.0
    assert bump_table_version(str(tmp_path / "nope")) == -1.0


def test_stamp_not_visible_to_parquet_readers(spark, tmp_path):
    """The underscore-prefixed stamp must never be read as data."""
    t = str(tmp_path / "t2")
    _mk_table(spark, t)
    assert spark.read.parquet(t).count() == 30
    import duckdb
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{t}/*/*.parquet')").fetchone()
    assert n[0] == 30


# ------------------------------------------------- mtime-less storage shim
def _shim_mtimeless(monkeypatch, root: str) -> None:
    """Make every path under ``root`` behave like an object store:
    no directory mtime, no utime."""
    real_getmtime = os.path.getmtime
    real_utime = os.utime

    def fake_getmtime(p):
        if str(p).startswith(root):
            raise OSError("no mtime on object storage")
        return real_getmtime(p)

    def fake_utime(p, *a, **kw):
        if str(p).startswith(root):
            raise OSError("no utime on object storage")
        return real_utime(p, *a, **kw)

    monkeypatch.setattr(os.path, "getmtime", fake_getmtime)
    monkeypatch.setattr(os, "utime", fake_utime)


def test_stamp_only_version_advances_without_mtime(spark, tmp_path,
                                                   monkeypatch):
    t = str(tmp_path / "t3")
    _mk_table(spark, t)
    _shim_mtimeless(monkeypatch, str(tmp_path))
    v1 = table_version(t)
    assert v1 > 0                      # served from the stamp alone
    _mk_table(spark, t, mod=2)
    assert table_version(t) > v1


def test_binding_cache_invalidates_on_stamp_only_storage(spark, tmp_path,
                                                         monkeypatch):
    """The binding DataFrame memo must drop its entry after a rewrite
    even when the table root has no mtime."""
    from maha_spark.plans.binding import ParquetBinding
    base = str(tmp_path)
    t = os.path.join(base, "facts")
    _mk_table(spark, t)
    _shim_mtimeless(monkeypatch, base)
    b = ParquetBinding(spark, base)
    before = b.table("facts").agg({"v": "sum"}).collect()[0][0]
    _mk_table(spark, t, mod=7)   # +7 on each of 30 rows
    after = b.table("facts").agg({"v": "sum"}).collect()[0][0]
    assert after == before + 30 * 7


def test_result_cache_stamps_on_stamp_only_storage(spark, tmp_path,
                                                   monkeypatch):
    """table_stamps must change across a rewrite with mtime shimmed out
    (stamp carries the version). An ABSENT table (no binding path, not
    readable) stamps as the stable -1.0 sentinel — its absence is
    cacheable state; a READABLE path-less table still forces a bypass
    (it can change without any stamp moving)."""
    from maha_spark.execution.result_cache import table_stamps

    base = str(tmp_path)
    t = os.path.join(base, "facts")
    _mk_table(spark, t)

    class _B:
        def table_path(self, name):
            return t if name == "facts" else None

    _shim_mtimeless(monkeypatch, base)
    s1 = table_stamps(_B(), ["facts"])
    _mk_table(spark, t, mod=3)
    s2 = table_stamps(_B(), ["facts"])
    assert s1 and s2 and s1 != s2
    # absent candidate (e.g. a never-materialized advised rollup):
    # stable sentinel, not a bypass
    assert table_stamps(_B(), ["missing"]) == (("missing", -1.0),)

    class _BReadable(_B):
        def has_table(self, name):
            return True

    # readable but path-less (catalog/override binding): bypass
    assert table_stamps(_BReadable(), ["missing"]) is None


def test_skipping_staleness_on_stamp_only_storage(spark, tmp_path,
                                                  monkeypatch):
    """The sidecar freshness gate must read stale after a rewrite (and
    fresh after a refresh) with no mtime available anywhere under the
    table — pure stamp-driven."""
    from maha_spark.plans.skipping import (build_skipping_index,
                                           index_stale,
                                           refresh_skipping_index)
    base = str(tmp_path)
    t = os.path.join(base, "facts")
    idx = os.path.join(base, "idx")
    _mk_table(spark, t)
    build_skipping_index(spark, t, ["id"], idx)
    assert not index_stale(t, idx, "id")
    _shim_mtimeless(monkeypatch, base)
    _mk_table(spark, t, mod=5)
    assert index_stale(t, idx, "id")
    # explicit days: the portable refresh path (no dir-mtime scan)
    refresh_skipping_index(spark, t, idx,
                           days=["2000-01-01", "2000-01-02", "2000-01-03"])
    assert not index_stale(t, idx, "id")
