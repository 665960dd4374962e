"""Training-data assembly ops (ops/packing.py): sequence packing,
stratified hash sampling, token quantiles — plus oracle pins for the
multimodal ops that rotated out of the 50-entry driver contract."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.ops import asof, multimodal, packing, similarity  # noqa: E402


def _match(sdf, osql, duck):
    from tests.test_entry_contract import normalize
    pdf = sdf.toPandas()
    ddf = duck.execute(osql).df()
    assert sorted(pdf.columns) == sorted(ddf.columns)
    assert len(pdf) == len(ddf)
    s = normalize(pdf[sorted(pdf.columns)].itertuples(index=False, name=None))
    d = normalize(ddf[sorted(ddf.columns)].itertuples(index=False, name=None))
    assert s == d


# ------------------------------------------------------------- packing
def test_pack_budget_invariant(spark, sf_dir):
    man = packing.pack_manifest(spark, sf_dir).collect()
    assert man, "no sequences produced"
    for r in man:
        # a sequence either fits the budget or is a single over-long doc
        assert r.total_tok <= packing.PACK_BUDGET or r.n_docs == 1, r


def test_pack_covers_every_doc_with_contiguous_offsets(spark, sf_dir):
    from maha_spark.ops.common import load_table
    rows = packing.pack_sequences(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_seq: dict = {}
    for r in rows:
        by_seq.setdefault((r.shard, r.seq_id), []).append(r)
    for docs in by_seq.values():
        docs.sort(key=lambda r: r.tok_offset)
        pos = 0
        for r in docs:
            assert r.tok_offset == pos, "gap inside a packed sequence"
            pos += r.n_tok


# ------------------------------------------------------------ sampling
def test_sample_rates_are_deterministic_and_roughly_right(spark, sf_dir):
    kept = packing.sample_stratified(spark, sf_dir).collect()
    again = packing.sample_stratified(spark, sf_dir).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in again)
    by_lang: dict = {}
    for r in kept:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rate = packing.SAMPLE_RATES.get(lang, packing.SAMPLE_DEFAULT)
        assert all(r.rate_pm == rate for r in rows)
        assert all(abs(r.weight - 1000.0 / rate) < 1e-12 for r in rows)


def test_sample_is_stable_under_corpus_growth(spark, sf_dir):
    """Hash sampling must keep the same docs when the corpus grows — the
    property that makes re-runs reproducible on an appended corpus."""
    full = {r.doc_id
            for r in packing.sample_stratified(spark, sf_dir).collect()}
    # a "smaller earlier corpus": the op on a filtered view of the table
    from maha_spark.ops.common import load_table
    docs = load_table(spark, sf_dir, "documents")
    half_ids = {r.doc_id for r in docs.select("doc_id").collect()
                if r.doc_id % 2 == 0}
    sub = packing.sample_stratified(spark, sf_dir).filter(
        f"doc_id % 2 = 0")
    assert {r.doc_id for r in sub.collect()} == full & half_ids


# ----------------------------------------------------------- quantiles
def test_approx_quantiles_match_exact_shape_and_bounds(spark, sf_dir):
    exact = {r.lang: r for r in
             packing.token_quantiles(spark, sf_dir).collect()}
    approx = {r.lang: r for r in
              packing.approx_quantiles(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n_docs == e.n_docs
        for col in ("p50", "p90", "p99"):
            # GK with accuracy 10k on a few hundred rows is exact up to
            # the interpolation-vs-nearest-rank definition gap
            assert abs(getattr(a, col) - getattr(e, col)) <= 2.0, (lang, col)


# ------------------------------------------- off-contract exact oracles
# operators rotated out of the 50-entry driver contract keep their exact
# DuckDB oracle pinned here (token_quantiles rotated out round 6; its
# slot went back to op_embed_quantize)
@pytest.mark.parametrize("fn,osql", [
    (multimodal.mm_resize, multimodal.mm_resize_oracle()),
    (multimodal.mm_frame_sample, multimodal.mm_frame_sample_oracle()),
    (packing.token_quantiles, packing.token_quantiles_oracle()),
    (packing.mix_balance, packing.mix_balance_oracle()),
    (similarity.sim_lsh_buckets, similarity.sim_lsh_buckets_oracle()),
    (asof.asof_join, asof.asof_join_oracle()),
    # r11 rotation: all-pairs cosine + int8 quantization off contract
    # (slots restored q3_daily_revenue / q15_outer_filter)
    (similarity.sim_pairs, similarity.sim_pairs_oracle()),
    (similarity.embed_quantize, similarity.embed_quantize_oracle()),
])
def test_mm_offcontract_oracle(fn, osql, spark, duck, sf_dir):
    _match(fn(spark, sf_dir), osql, duck)
