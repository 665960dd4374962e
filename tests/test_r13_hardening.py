"""Round-13 optimization pins.

The r13 work restaged hot projections and overlapped independent legs;
these tests pin the value-identity claims the optimizations rest on.
"""

from __future__ import annotations

import pytest


def test_staged_text_stats_equals_naive_spelling(spark, sf_dir):
    """text_stats_frame (staged, single-evaluation HOFs) must produce
    exactly the rows/columns of the naive one-projection spelling of
    ``_stats_exprs(spark_side=True)`` — the form the DuckDB oracle
    mirrors term by term."""
    from maha_spark.ops import text
    from maha_spark.ops.common import load_table, words_sql

    docs = load_table(spark, sf_dir, "documents")
    exprs = text._stats_exprs("w", spark_side=True)
    proj = [f"{sql} AS {name}" for name, sql in exprs.items()]
    naive = (docs.selectExpr("doc_id", "text", f"{words_sql()} AS w")
             .selectExpr("doc_id", *proj))
    staged = text.text_stats_frame(docs)
    a = naive.orderBy("doc_id").toPandas()
    b = staged.orderBy("doc_id").toPandas()
    assert list(a.columns) == list(b.columns)
    assert a.equals(b)


def test_staged_text_stats_single_vote_evaluation(spark, sf_dir):
    """The staged plan must evaluate each language-vote filter once:
    the naive spelling inlined ``size(filter(w, ...))`` 14x per row
    (every lang_pred branch + stop_ratio + quality_score)."""
    from maha_spark.ops import text
    from maha_spark.ops.common import load_table

    plan = text.text_stats_frame(
        load_table(spark, sf_dir, "documents"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("size(filter(w") <= 4   # one per language
    assert plan.count("array_distinct(w") <= 1


def test_incremental_precomputed_batch_frames_identical(spark, sf_dir,
                                                        tmp_path):
    """dedup_incremental with caller-supplied batch frames (the op's
    §2.6 overlap path) must equal the self-built path row for row."""
    from maha_spark.ops import incremental
    from maha_spark.ops.common import load_table, release_scoped_caches
    from maha_spark.ops.dedup import lsh_band_frame, lsh_shingle_frame

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 5 != 0")
    batch = docs.filter("doc_id % 5 = 0")
    idx = str(tmp_path / "idx")
    incremental.materialize_dedup_index(spark, corpus, idx)
    plain = (incremental.dedup_incremental(spark, idx, batch)
             .orderBy("a_id", "b_id").toPandas())
    release_scoped_caches()
    base_new = lsh_shingle_frame(batch)
    bands_new = lsh_band_frame(base_new)
    pre = (incremental.dedup_incremental(
               spark, idx, batch, _batch_frames=(base_new, bands_new))
           .orderBy("a_id", "b_id").toPandas())
    release_scoped_caches()
    assert plain.equals(pre)
