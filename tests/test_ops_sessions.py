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
