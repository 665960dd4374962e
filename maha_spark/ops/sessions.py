"""Sessionization over the ``events`` table: gap-based user sessions.

Net-new LLM/analytics-pipeline operator (the reference has no streaming or
stateful operators; SURVEY.md §2.9). Two implementations with identical
semantics:

* ``sessionize`` (batch, oracle-checked): pure window functions — a lag
  over (user_id ORDER BY ts, event_id) marks gap breaks, a running sum
  assigns session ids, one groupBy aggregates. Scale: the only shuffle is
  the window/group partitioning BY USER — no global window, no driver
  state; at 100 TB this is the standard shuffle-by-key + sort-within-
  partitions plan.
* ``streaming_sessions`` (Structured Streaming, ``applyInPandasWithState``):
  per-user session state (open-session tuple + session counter) in the
  state store, gap-closure inside each micro-batch, and event-time
  timeouts (watermark-driven) to flush sessions that stay open across
  batches. The same sentinel-flush pattern as streaming/hourly.py makes
  the drained output EXACTLY equal the batch answer — pinned by
  tests/test_ops_sessions.py.

The session gap is 30 minutes. Value totals accumulate in integer
hundred-thousandths (micro-units) in both paths — the exact arithmetic of
the batch DECIMAL(8,5) sum — so stream == batch bit-for-bit.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

SESSION_GAP_MIN = 30
_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

OUT_SCHEMA = ("user_id long, session_id long, n_events long, "
              "session_start string, session_end string, total_value double")


# ------------------------------------------------------------------ batch
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import load_table
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # ts is TIMESTAMP_NTZ (binding-normalized); naive datetime subtraction
    # is timezone-free on both engines (DuckDB epoch_us is also naive)
    us_expr = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    b = (ev.select("user_id", "event_id", "ts", "value",
                   us_expr.alias("us"))
         .withColumn("prev_us", F.lag("us").over(w))
         .withColumn("new_s",
                     F.when(F.col("prev_us").isNull(), 0)
                      .when(F.col("us") - F.col("prev_us") > _GAP_US, 1)
                      .otherwise(0))
         .withColumn("session_id", F.sum("new_s").over(wsum)))
    return (b.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.date_format(F.min("ts"), _TS_FMT_SPARK)
                  .alias("session_start"),
                 F.date_format(F.max("ts"), _TS_FMT_SPARK)
                  .alias("session_end"),
                 F.sum(F.col("value").cast("decimal(8,5)"))
                  .cast("double").alias("total_value")))


def sessionize_oracle() -> str:
    return f"""
        WITH b AS (
            SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events
        ), s AS (
            SELECT *, CAST(SUM(CASE WHEN prev_us IS NULL THEN 0
                                    WHEN us - prev_us > {_GAP_US} THEN 1
                                    ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM b
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
               strftime(MAX(ts), '{_TS_FMT_DUCK}') AS session_end,
               CAST(SUM(CAST(value AS DECIMAL(8,5))) AS DOUBLE)
                   AS total_value
        FROM s GROUP BY 1, 2
    """


# -------------------------------------------------------------- streaming
def _fmt_us(us: int) -> str:
    import datetime as _dt
    return _dt.datetime.fromtimestamp(
        us // 1_000_000, tz=_dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


# DOUBLE value -> integer hundred-thousandths with HALF_UP rounding
# (x * _UNITS_SCALE + 0.5, truncated toward zero) — the exact arithmetic
# of CAST(value AS DECIMAL(8,5)) summation. _units_np is the ONLY
# implementation; the stream==batch bit-parity pinned by
# tests/test_ops_sessions.py rides on this one rounding rule.
_UNITS_SCALE = 100_000


def _units_np(values):
    import numpy as np
    return (values * _UNITS_SCALE + 0.5).astype(np.int64)


def streaming_sessions_df(spark: SparkSession, events_dir: str,
                          glob: str | None = None) -> DataFrame:
    """readStream -> groupBy(user) -> applyInPandasWithState session op.

    State per user: (next_session_id, start_us, last_us, n_events,
    total_units). Each batch sorts its events, closes sessions at >30 min
    gaps (emitting them), keeps the open tail in the state store, and arms
    an event-time timeout at last_ts + gap so the watermark flushes
    sessions no future event can extend. Exactly-once via the sink commit
    log + checkpointed state, horizontally partitioned by user — no
    driver-side state anywhere.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from ..streaming.hourly import EVENT_SCHEMA

    # Watermarks require TIMESTAMP (not NTZ); pin the session to UTC so the
    # NTZ->TIMESTAMP cast is the identity instant and every boundary /
    # formatted string is timezone-free.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.readStream.schema(EVENT_SCHEMA).format("parquet")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(events_dir)
    ev = (raw.withColumn("ts", F.col("ts").cast("timestamp"))
          .withWatermark("ts", "1 second"))

    out_cols = ["user_id", "session_id", "n_events",
                "session_start", "session_end", "total_value"]

    def fn(key, pdfs, state: GroupState):
        user_id = int(key[0])
        closed: list[tuple] = []

        if state.exists:
            sid, start_us, last_us, n, units = state.get
        else:
            sid, start_us, last_us, n, units = 0, None, None, 0, 0

        if state.hasTimedOut:
            # watermark passed last_us + gap: no event can extend this
            # session any more -> emit and clear
            if start_us is not None:
                closed.append((user_id, sid, n, _fmt_us(start_us),
                               _fmt_us(last_us), units / _UNITS_SCALE))
            state.remove()
        else:
            import numpy as np
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if chunks:
                cat = chunks[0] if len(chunks) == 1 else pd.concat(
                    chunks, ignore_index=True)
                # vectorized twin of the per-event loop (13 us/row with
                # itertuples): sort by time, find >gap breaks, aggregate
                # each segment with reduceat. Order among equal-us events
                # is immaterial: gap breaks depend only on us, and every
                # per-session aggregate (count/min/max/sum) is
                # order-invariant.
                us = (cat["ts"].to_numpy().astype("datetime64[us]")
                      .astype(np.int64))
                order = np.argsort(us, kind="stable")
                us = us[order]
                ev_units = _units_np(cat["value"].to_numpy()[order])
                brk = np.empty(len(us), dtype=bool)
                brk[0] = True
                np.greater(np.diff(us), _GAP_US, out=brk[1:])
                starts = np.flatnonzero(brk)
                counts = np.diff(np.append(starts, len(us)))
                seg_units = np.add.reduceat(ev_units, starts)
                seg_start = us[starts]
                seg_end = us[np.append(starts[1:], len(us)) - 1]
                if start_us is not None and us[0] - last_us <= _GAP_US:
                    # the carried open session absorbs segment 0
                    seg_start[0] = start_us
                    counts[0] += n
                    seg_units[0] += units
                elif start_us is not None:
                    closed.append((user_id, sid, n, _fmt_us(start_us),
                                   _fmt_us(last_us), units / _UNITS_SCALE))
                    sid += 1
                for i in range(len(starts) - 1):
                    closed.append((user_id, sid, int(counts[i]),
                                   _fmt_us(int(seg_start[i])),
                                   _fmt_us(int(seg_end[i])),
                                   seg_units[i] / _UNITS_SCALE))
                    sid += 1
                start_us, last_us = int(seg_start[-1]), int(seg_end[-1])
                n, units = int(counts[-1]), int(seg_units[-1])
            state.update((sid, start_us, last_us, n, units))
            state.setTimeoutTimestamp((last_us + _GAP_US) // 1000)

        yield pd.DataFrame(closed, columns=out_cols)

    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=("sid long, start_us long, last_us long, "
                         "n long, units long"),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout)


def streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correctness entry: stage the events backlog, drain through the
    stateful operator into a parquet append sink, flush open sessions with
    a sentinel watermark advance, and read the files back. The sentinel's
    own group (user -1) stays open and is excluded."""
    import shutil
    from ..streaming.hourly import bounded_shuffle, write_sentinel

    work = tempfile.mkdtemp(prefix="maha-sess-")
    input_dir = os.path.join(work, "input")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(input_dir)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(input_dir, "batch1.parquet"))

    def drain() -> None:
        q = (streaming_sessions_df(spark, input_dir).writeStream
             .format("parquet")
             .outputMode("append")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    import datetime as _dt
    max_ts = (spark.read
              .parquet(os.path.join(input_dir, "batch1.parquet"))
              .agg(F.max("ts")).collect()[0][0])
    write_sentinel(spark, input_dir, max_ts + _dt.timedelta(hours=3))
    with bounded_shuffle(spark):
        # ONE drain: both files land in the first micro-batch (gap-closed
        # sessions emit inline), then the trailing no-data micro-batch —
        # scheduled because the watermark jumped past sentinel-1s — fires
        # every event-time timeout and flushes the open tails. One query
        # startup instead of two.
        drain()

    return (spark.read.schema(OUT_SCHEMA).parquet(out_dir)
            .filter("user_id >= 0"))
