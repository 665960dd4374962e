"""Streaming-maintained pre-aggregated rollup served by the planner.

The reference's rollups (``FactBuilder.newRollUp`` / ``withNewGrain``,
``fact/Fact.scala:867,1385``) are pre-aggregated physical copies of a
fact that RE-DECLARE the column set — metrics become summable partials
(a stored count re-aggregates with SUM, not COUNT) and discarded raw
columns disqualify the copy from requests that need them — competing on
cost in candidate selection (``getCandidatesFor`` /
``findBestFactCandidate``).

The Spark-first twin: the watermarked hourly stream
(``streaming/hourly.py``) continuously materializes exactly such a copy.
This module registers BOTH tables under one cube, so hour-grain queries
are served from the streamed rollup (~#hours x #types rows) while
anything the rollup cannot answer — per-user distinct counts here —
silently falls back to the raw events table. At 100 TB this is the
difference between scanning a few million pre-aggregated rows and the
raw event log on every dashboard refresh.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from ..core.columns import DerivedDimCol, DerivedFactCol, DimCol, FactCol
from ..core.grain import HOURLY
from ..core.rollup import (CardinalityRollup, CountRollup,
                           HllSketchRollup, HllUnionRollup, SumRollup)
from ..core.types import (BinType, DateType, DecType, IntType, StrType,
                          TimestampType)
from ..core.filters import IN_BETWEEN_EQUALITY
from ..registry.cube import FactTable, PubCol, PublicFact, Registry

ROLLUP_TABLE = "events_hourly"

_HOUR_FMT = "yyyy-MM-dd HH:mm:ss"


def _shared_time_cols() -> dict:
    """Identical logical time derivations in both tables — on the rollup,
    ``ts`` already sits at hour grain, so the trunc is the identity and
    the same definitions hold."""
    return {
        "ts": DimCol("ts", TimestampType(), is_day_column=True),
        "event_day": DerivedDimCol("event_day", DateType(),
                                   expr="CAST({ts} AS DATE)"),
        "event_hour": DerivedDimCol(
            "event_hour", StrType(),
            expr="date_trunc('hour', {ts})",
            render_expr=f"date_format({{self}}, '{_HOUR_FMT}')"),
        "event_type": DimCol("event_type", StrType()),
    }


def build_stream_rollup_registry() -> Registry:
    reg = Registry()

    base_cols = {
        **_shared_time_cols(),
        "event_id": DimCol("event_id", IntType()),
        "user_id": DimCol("user_id", IntType()),
        "value": FactCol("value", DecType()),
        # exact integer hundred-thousandths (HALF_UP) — associative, so
        # the streamed partial sums re-aggregate bit-exactly
        "value_dec": FactCol("value_dec", IntType(),
                             expr="CAST({value} * 100000 + 0.5 AS BIGINT)",
                             depends_on=("value",)),
        "event_count": FactCol("event_count", IntType(),
                               rollup=CountRollup()),
        "user_cnt": FactCol("user_cnt", IntType(),
                            rollup=CardinalityRollup(exact=True),
                            expr="{user_id}", depends_on=("user_id",)),
        "total_value": DerivedFactCol(
            "total_value", DecType(),
            expr="(CAST({value_dec} AS DOUBLE) / 100000.0)"),
    }
    base_cols["user_hll"] = FactCol(
        "user_hll", BinType(), rollup=HllSketchRollup(),
        expr="{user_id}", depends_on=("user_id",))
    base_cols["user_count_hll"] = DerivedFactCol(
        "user_count_hll", IntType(),
        expr="CAST(hll_sketch_estimate({user_hll}) AS BIGINT)")
    base = FactTable(name="events", columns=base_cols, grain=HOURLY,
                     day_column="ts", cost=1000)

    rollup_cols = {
        **_shared_time_cols(),
        # stored partials: COUNT re-aggregates as SUM, the cents sum as
        # SUM, the ingest-computed HLL sketch as union (hyperUnique
        # rollup parity — approx distinct served at ANY grain)
        "value_dec": FactCol("value_dec", IntType(), rollup=SumRollup()),
        "event_count": FactCol("event_count", IntType(),
                               rollup=SumRollup()),
        "user_hll": FactCol("user_hll", BinType(),
                            rollup=HllUnionRollup()),
        "user_count_hll": DerivedFactCol(
            "user_count_hll", IntType(),
            expr="CAST(hll_sketch_estimate({user_hll}) AS BIGINT)"),
        "total_value": DerivedFactCol(
            "total_value", DecType(),
            expr="(CAST({value_dec} AS DOUBLE) / 100000.0)"),
    }
    rollup = FactTable(
        name=ROLLUP_TABLE, columns=rollup_cols, grain=HOURLY,
        day_column="ts", cost=100,
        discarded={"event_id", "user_id", "value", "user_cnt", "props"},
        grain_cols=["event_hour", "event_type"])

    reg.register_fact(PublicFact(
        name="events_cube",
        tables=[base, rollup],
        pub_cols=[PubCol("day", "event_day", IN_BETWEEN_EQUALITY),
                  PubCol("hour", "event_hour"),
                  PubCol("event_type", "event_type")],
        pub_fact_cols=[PubCol("event_count", "event_count"),
                       PubCol("total_value", "total_value"),
                       PubCol("user_count", "user_cnt"),
                       PubCol("user_count_approx", "user_count_hll")],
        day_alias="day"))
    return reg


def materialize_hourly_rollup(spark: SparkSession, sf_dir: str,
                              base_dir: str) -> str:
    """Stream-drain the events backlog into the rollup's physical layout
    under ``base_dir`` and stage the raw events beside it.

    The streamed output IS the rollup content (watermarked tumbling
    windows == GROUP BY hour, type); only the layout changes: the hour
    string returns to a truncated timestamp and the double total returns
    to the integer partial it was summed in.
    """
    from ..streaming.hourly import streaming_hourly

    streamed = streaming_hourly(spark, sf_dir, with_sketch=True)
    (streamed.selectExpr(
        f"CAST(to_timestamp(hour, '{_HOUR_FMT}') AS TIMESTAMP_NTZ) AS ts",
        "event_type",
        "event_count",
        "CAST(round(total_value * 100000) AS BIGINT) AS value_dec",
        "user_hll")
     .write.mode("overwrite")
     .parquet(os.path.join(base_dir, f"{ROLLUP_TABLE}.parquet")))
    dst = os.path.join(base_dir, "events.parquet")
    if not os.path.exists(dst):
        os.symlink(os.path.join(sf_dir, "events.parquet"), dst)
    return base_dir
