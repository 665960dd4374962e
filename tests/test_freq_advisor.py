"""Frequent-items advisor loop (registry/freq_advisor.py): mine
TopN-by-count requests from the ledger, materialize day-grain partials,
serve the logged shape from partials alone — exact where k' covers the
cardinality, bounds honest where it doesn't."""

from __future__ import annotations

import json
import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from maha_spark.engine import engine_for_dir  # noqa: E402
from maha_spark.registry.freq_advisor import (  # noqa: E402
    build_recommended_freq_partials, freq_partials_dir,
    recommend_freq_topk, serve_freq_topn)

SRC = "/root/testdata/sf0.001"


def _topn_req(dim="event_type", metric="event_count", k=3, order="DESC",
              extra_filters=(), dims_extra=()):
    return json.dumps({
        "cube": "events_cube",
        "selectFields": [{"field": d} for d in (dim, *dims_extra)]
        + [{"field": metric}],
        "filterExpressions": [
            {"field": "day", "operator": "between",
             "from": "2024-01-01", "to": "2024-01-31"},
            *extra_filters,
        ],
        "sortBy": [{"field": metric, "order": order}],
        "rowsPerPage": k,
    })


@pytest.fixture(scope="module")
def events_engine(spark):
    from maha_spark.examples.contract import build_contract_registry
    return engine_for_dir(spark, build_contract_registry(), SRC)


def test_mines_only_servable_topn_shapes(events_engine):
    ledger = [
        _topn_req(k=3), _topn_req(k=5),                 # qualify (max_k 5)
        _topn_req(dim="user_id", k=10),                 # once: under min
        _topn_req(order="ASC"),                          # bottom-N: no
        _topn_req(metric="total_value"),                 # sum metric: no
        _topn_req(extra_filters=(
            {"field": "event_type", "operator": "=",
             "value": "click"},)),                       # filtered: no
        _topn_req(dims_extra=("user_id",)),              # two dims: no
        "not json at all",                               # tolerated
    ]
    recs = recommend_freq_topk(events_engine, ledger, min_count=2)
    assert len(recs) == 1
    r = recs[0]
    assert (r.table, r.column, r.day_col) == ("events", "event_type", "ts")
    assert r.count == 2 and r.max_k == 5
    assert r.kprime >= 4 * 5
    assert "events.event_type" in r.describe()
    # unbounded page (the -1 full-listing shape) must NOT qualify
    assert not recommend_freq_topk(
        events_engine, [_topn_req(k=-1)] * 3, min_count=2)


def test_build_and_serve_matches_raw_topn(spark, events_engine, tmp_path):
    """k' >= ndv(event_type): the served top-N IS the raw answer, every
    row guaranteed with lb == ub — the logged dashboard query answered
    from partials alone."""
    base = str(tmp_path / "data")
    os.makedirs(base)
    shutil.copy(os.path.join(SRC, "events.parquet"),
                os.path.join(base, "events.parquet"))
    recs = recommend_freq_topk(
        events_engine, [_topn_req(k=3)] * 2, min_count=2)
    paths = build_recommended_freq_partials(spark, base, recs)
    assert paths == [freq_partials_dir(base, "events", "event_type")]

    got = serve_freq_topn(spark, paths[0], k=3,
                          date_from="2024-01-08",
                          date_to="2024-01-21").collect()
    raw = (spark.read.parquet(os.path.join(base, "events.parquet"))
           .filter("CAST(ts AS DATE) BETWEEN '2024-01-08' "
                   "AND '2024-01-21' AND event_type IS NOT NULL")
           .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
           .orderBy(F.desc("n"), F.asc("event_type")).limit(3).collect())
    assert [(r["value"], r["count_lb"]) for r in got] == \
        [(r["event_type"], r["n"]) for r in raw]
    assert all(r["guaranteed"] and r["count_lb"] == r["count_ub"]
               for r in got)
    assert [r["rank"] for r in got] == [1, 2, 3]
