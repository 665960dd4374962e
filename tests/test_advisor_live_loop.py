"""Advisor loop driven from the LIVE request-log ledger (VERDICT r7 #2):
a randomized fuzz workload executes through the full engine with a
request logger attached, the advisor mines the COLLECTED ledger entries
(not a hand-fed fixture), the top recommendation is materialized and
registered, and a held-out slice of the same workload distribution is
served from the ADVISED table bit-equal (up to IEEE partial
re-association) to the raw path — the automated analogue of the human
who writes ``FactBuilder.newRollUp`` (fact/Fact.scala:1385) after
reading query logs."""

from __future__ import annotations

import datetime as dt
import math
import os
import random
import sys

import pytest

# soak-style end-to-end suites (their session fixtures alone cost ~25 s):
# slow tail, excluded from the default run (see pyproject.toml)
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.engine import MahaSparkEngine, engine_for_dir  # noqa: E402
from maha_spark.examples.tpch import build_registry  # noqa: E402
from maha_spark.log.request_log import CollectingRequestLogWriter  # noqa: E402
from maha_spark.plans.binding import ParquetBinding  # noqa: E402
from maha_spark.registry.advisor import _NdvProbe, recommend_rollups  # noqa: E402
from maha_spark.registry.materializer import apply_recommendation  # noqa: E402

SRC = "/root/testdata/sf0.001"
SEED = 1207

#: the workload's dim pool — the advisor should discover a grain over
#: the frequent ones; Order Priority / Order Count force raw fallback
DIMS = ["Nation Name", "Region Name", "Market Segment", "Month"]
METS = ["Revenue", "Total Quantity", "Line Count", "Max Price",
        "Min Price", "Returned Quantity", "Charge"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _gen_request(rng: random.Random, fallback: bool = False) -> dict:
    dims = rng.sample(DIMS, rng.randint(1, 2))
    mets = rng.sample(METS, rng.randint(1, 3))
    if fallback:
        # an attribute no advised grain can cover (skipped orders dim /
        # exact-distinct metric)
        if rng.random() < 0.5:
            dims.append("Order Priority")
        else:
            mets.append("Order Count")
    start = dt.date(1995, 1, 1) + dt.timedelta(days=rng.randint(0, 1500))
    end = start + dt.timedelta(days=rng.randint(90, 900))
    filters = [{"field": "Day", "operator": "between",
                "from": start.isoformat(), "to": end.isoformat()}]
    if rng.random() < 0.4:
        filters.append({"field": "Region Name", "operator": "in",
                        "values": rng.sample(REGIONS, rng.randint(1, 3))})
    return {"cube": "lineitem_stats",
            "selectFields": [{"field": f} for f in dims + mets],
            "filterExpressions": filters,
            "rowsPerPage": -1}


def _prod_probe():
    """What-if cardinalities at production scale — without it the
    advisor is honestly empty at sf0.001 (no grain compresses 6k rows).
    The LEDGER is live; only the cardinality model is what-if."""
    return _NdvProbe.fixed(
        rows={"lineitem": 600_000_000, "orders": 150_000_000,
              "customer": 15_000_000, "nation": 25, "region": 5},
        ndvs={("lineitem", "l_shipdate"): 2500,
              ("lineitem", "l_returnflag"): 3,
              ("lineitem", "l_linestatus"): 2,
              ("customer", "c_mktsegment"): 5,
              ("nation", "n_name"): 25, ("region", "r_name"): 5})


def _rows(eng, req, fields):
    return sorted((tuple(r[f] for f in fields) for r in
                   eng.dataframe(req).collect()),
                  key=lambda t: tuple((v is None, str(v)) for v in t))


def _close_rows(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for x, y in zip(ra, rb):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float) \
                    and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                continue
            return False
    return True


@pytest.fixture(scope="module")
def advised(spark, tmp_path_factory):
    """Execute the training workload through the LIVE engine (logger
    attached), mine the collected ledger, apply the top recommendation.
    Returns (registry, data dir, writer, recs)."""
    d = str(tmp_path_factory.mktemp("advised_live"))
    for t in os.listdir(SRC):
        os.symlink(os.path.join(SRC, t), os.path.join(d, t))
    reg = build_registry()
    writer = CollectingRequestLogWriter()
    eng = MahaSparkEngine(spark, reg, ParquetBinding(spark, d),
                          request_logger=writer)
    rng = random.Random(SEED)
    train = [_gen_request(rng) for _ in range(20)] \
        + [_gen_request(rng, fallback=True) for _ in range(4)]
    for req in train:
        import json
        out = eng.execute(json.dumps(req))
        assert "rows" in out
    assert len(writer.entries) == len(train)
    recs = recommend_rollups(eng, writer.entries, top_n=3,
                             probe=_prod_probe())
    assert recs, "advisor mined the live ledger and recommended nothing"
    apply_recommendation(eng, recs[0], d, "advised_live")
    return reg, d, writer, recs


def test_heldout_slice_served_from_advised_rollup(spark, advised):
    """Held-out requests from the same distribution: every one matches
    the raw path; the coverable majority is SERVED from the advised
    table and the uncoverable ones fall back — both paths exercised."""
    reg, d, _writer, _recs = advised
    raw = engine_for_dir(spark, build_registry(), SRC)
    rolled = engine_for_dir(spark, reg, d)
    rng = random.Random(SEED + 99)   # held-out: disjoint from training
    held = [(_gen_request(rng), False) for _ in range(10)] \
        + [(_gen_request(rng, fallback=True), True) for _ in range(3)]
    served = set()
    n_advised = 0
    for req, fallback in held:
        fields = [f["field"] for f in req["selectFields"]]
        t = rolled.model(req).fact_table.name
        served.add(t)
        if fallback:
            assert t == "lineitem", (t, req)
        elif t == "advised_live":
            n_advised += 1
        a = _rows(raw, req, fields)
        b = _rows(rolled, req, fields)
        assert a and _close_rows(a, b), req
    assert "advised_live" in served and "lineitem" in served, served
    assert n_advised >= 5, f"advised table served only {n_advised}/10"


def test_ledger_entries_carry_model_facts(advised):
    """The mined entries are real build_log_entry records from the
    engine lifecycle (table selection + timing), not synthetic JSON."""
    _reg, _d, writer, _recs = advised
    for e in writer.entries:
        assert e.cube == "lineitem_stats"
        assert e.driving_table == "lineitem"
        assert e.json_request
        assert e.request_start_time > 0


def test_recommendation_reflects_workload_not_fixture(advised):
    """The chosen grain is workload-derived: it stores the customer
    nation entry (the frequent Nation/Region chain) and only fact dims
    the workload actually grouped."""
    _reg, _d, _writer, recs = advised
    rec = recs[0]
    assert any(enc.entry_dim == "customer_nation" for enc in rec.chains)
    assert rec.n_covered > 0 and rec.coverage > 0.5, rec
