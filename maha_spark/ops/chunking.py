"""Document chunking: fixed-token windows with overlap.

The step between corpus curation and sequence packing in a pretraining
pipeline: long documents split into ``chunk_tokens``-token windows that
overlap by ``overlap`` tokens (context preservation across boundaries —
the standard RAG/pretraining chunker shape).

Spark-first scale design: one explode over a per-row CHEAP index
sequence (number of chunks derives from the token count — no expensive
expression under the Generate, see the Generate-inlining rule in
ops/text.py), with the token array passing THROUGH the Generate and each
chunk sliced out post-explode. No shuffle at all until a consumer
aggregates: chunking is embarrassingly parallel over documents.

Exact DuckDB oracle (deterministic whitespace tokens, md5 fingerprints)
— pinned by tests/test_ops_quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import duck_words_sql, load_table, words_sql

CHUNK_TOKENS = 128
CHUNK_OVERLAP = 32


def chunk_documents(spark: SparkSession, sf_dir: str,
                    chunk_tokens: int = CHUNK_TOKENS,
                    overlap: int = CHUNK_OVERLAP) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tok, chunk_fp, chunk_text): one
    row per window. Windows start every ``chunk_tokens - overlap``
    tokens; the last window may be short; every document emits at least
    one chunk (empty docs emit one empty chunk)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    docs = load_table(spark, sf_dir, "documents")
    return (docs
            .selectExpr("doc_id", f"{words_sql()} AS w")
            # chunk COUNT from the token count: ceil((n - overlap)/step),
            # min 1 — a cheap per-row bound for the index sequence
            .selectExpr(
                "doc_id", "w",
                f"greatest(CAST(ceil((size(w) - {overlap}) / {step}.0) "
                "AS INT), 1) AS n_chunks")
            .selectExpr("doc_id", "w",
                        "explode(sequence(0, n_chunks - 1)) AS chunk_id")
            .selectExpr(
                "doc_id", "chunk_id",
                f"chunk_id * {step} AS start_tok",
                f"slice(w, chunk_id * {step} + 1, {chunk_tokens}) AS cw")
            # materialize the joined text ONCE, then derive the
            # fingerprint from it: two concat_ws(' ', cw) spellings would
            # re-evaluate the join per row (CollapseProject keeps the
            # two-Project shape because chunk_text is referenced twice and
            # concat_ws is not collapse-cheap — pinned in test_plan_shape)
            .selectExpr(
                "doc_id", "chunk_id", "start_tok",
                "size(cw) AS n_tok",
                "concat_ws(' ', cw) AS chunk_text")
            .selectExpr(
                "doc_id", "chunk_id", "start_tok", "n_tok",
                "md5(chunk_text) AS chunk_fp",
                "chunk_text"))


def chunk_documents_oracle(chunk_tokens: int = CHUNK_TOKENS,
                           overlap: int = CHUNK_OVERLAP) -> str:
    step = chunk_tokens - overlap
    return f"""
        WITH t AS (
            SELECT doc_id, {duck_words_sql()} AS w FROM documents
        ), c AS (
            SELECT doc_id, w,
                   GREATEST(CAST(ceil((len(w) - {overlap}) / {step}.0)
                            AS INT), 1) AS n_chunks
            FROM t
        )
        SELECT doc_id, chunk_id,
               chunk_id * {step} AS start_tok,
               len(cw) AS n_tok,
               md5(array_to_string(cw, ' ')) AS chunk_fp,
               array_to_string(cw, ' ') AS chunk_text
        FROM (
            SELECT doc_id, UNNEST(range(n_chunks)) AS chunk_id,
                   w FROM c
        ), LATERAL (SELECT list_slice(w, chunk_id * {step} + 1,
                                      chunk_id * {step} + {chunk_tokens})
                    AS cw)
    """
