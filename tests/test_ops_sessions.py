"""Sessionization: batch window-function op vs DuckDB oracle, and the
applyInPandasWithState streaming op vs the batch answer (exact)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.ops import sessions  # noqa: E402


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_batch_sessionize_matches_oracle(spark, duck, sf_dir):
    got = _norm(sessions.sessionize(spark, sf_dir).collect())
    exp = _norm(duck.execute(sessions.sessionize_oracle()).fetchall())
    assert len(got) == len(exp) > 0
    assert got == exp


def test_sessions_have_gap_semantics(spark, duck, sf_dir):
    rows = sessions.sessionize(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    import datetime as dt
    fmt = "%Y-%m-%d %H:%M:%S"
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.session_id)
        # session ids are dense from 0 and consecutive sessions are >30min apart
        assert [r.session_id for r in rs] == list(range(len(rs)))
        for a, b in zip(rs, rs[1:]):
            gap = (dt.datetime.strptime(b.session_start, fmt)
                   - dt.datetime.strptime(a.session_end, fmt))
            assert gap > dt.timedelta(minutes=30) - dt.timedelta(seconds=1)


def test_streaming_sessions_equal_batch(spark, sf_dir):
    """The stateful streaming operator (state store + event-time timeout
    flush) must reproduce the batch sessionization exactly."""
    got = _norm(sessions.streaming_sessions(spark, sf_dir).collect())
    exp = _norm(sessions.sessionize(spark, sf_dir).collect())
    assert len(got) == len(exp) > 0
    assert got == exp


def test_streaming_sessions_drop_late_events(spark, tmp_path):
    """An event arriving after the watermark has passed its session's
    timeout must NOT reopen or extend the already-emitted session."""
    import datetime as dt
    import os
    import pandas as pd
    from maha_spark.streaming.hourly import write_sentinel

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    (tmp_path / "src").mkdir()
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def batch(eids, offsets_min, users):
        return pd.DataFrame({
            "event_id": eids,
            "ts": pd.Series([t0 + dt.timedelta(minutes=m)
                             for m in offsets_min]).astype("datetime64[us]"),
            "user_id": users, "event_type": ["a"] * len(eids),
            "value": [1.0] * len(eids), "props": [""] * len(eids),
        })

    def drain():
        q = (sessions.streaming_sessions_df(spark, src).writeStream
             .format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # batch 1: user 1 events at 10:00 and 10:10 (one open session), plus a
    # sentinel-ish far-future row from user 2 that pushes the watermark
    # past 10:10 + 30min so user 1's session times out and emits
    batch([1, 2], [0, 10], [1, 1]).to_parquet(
        tmp_path / "src" / "b1.parquet")
    write_sentinel(spark, src, t0 + dt.timedelta(hours=3))
    drain()
    first = spark.read.schema(sessions.OUT_SCHEMA).parquet(out) \
        .filter("user_id = 1").collect()
    assert len(first) == 1 and first[0]["n_events"] == 2

    # batch 2: a LATE event at 10:15 (watermark is already ~13:00) — the
    # emitted session must stay closed with 2 events; the late event may
    # at most open a NEW session, never mutate the emitted one
    batch([3], [15], [1]).to_parquet(tmp_path / "src" / "b2.parquet")
    write_sentinel(spark, src, t0 + dt.timedelta(hours=6))
    drain()
    rows = (spark.read.schema(sessions.OUT_SCHEMA).parquet(out)
            .filter("user_id = 1").collect())
    sess0 = [r for r in rows if r["session_id"] == 0]
    assert len(sess0) == 1 and sess0[0]["n_events"] == 2
    assert sess0[0]["session_end"] == "2024-01-01 10:10:00"
