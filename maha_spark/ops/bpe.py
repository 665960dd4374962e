"""Distributed BPE tokenizer training + encoding (Sennrich, Haddow,
Birch: "Neural Machine Translation of Rare Words with Subword Units",
ACL'16 — the byte-pair-encoding subword learner every modern LLM data
pipeline runs before token counting/packing).

The whole corpus is touched exactly ONCE (the word-frequency
aggregation); training then iterates on the *vocabulary* frame — the
distinct-word table, which is orders of magnitude smaller than the
corpus (Heaps' law) and stays cached. Per merge step:

1. adjacent symbol pairs are exploded from the cached vocab (weighted
   by word frequency — Generate-safe, per-row codegen);
2. one map-side-combined groupBy picks the most frequent pair (the
   only shuffle, on the tiny pair table); ties break deterministically
   by (count DESC, a ASC, b ASC) so re-runs and different partitionings
   produce the identical merge list;
3. the winning pair is collected (ONE row — bounded driver state) and
   applied to every vocab row with a left-fold ``aggregate`` lambda
   (greedy leftmost merge, pure codegen — no UDF);
4. lineage is truncated per iteration (``localCheckpoint``) so step
   N's plan does not nest N higher-order functions.

Encoding applies the learned merge list IN RANK ORDER to each word
(the trainer's own semantics, so train-then-encode of the training
corpus reproduces the trainer's final symbol state). It runs as an
Arrow-batched pandas UDF with a per-batch word memo — Zipf-headed
corpora hit the memo for almost every token, so the per-word cost
amortizes away.

100 TB judgment: the corpus-sized passes (word count, encode) are a
single groupBy and a single mapInPandas-shaped projection; training
cost is ``n_merges`` tiny jobs over the cached vocab, independent of
corpus size. A production 32k-merge vocabulary means 32k driver-loop
jobs (~hours of scheduler overhead) — real trainers batch compatible
merges per round; the loop here is the faithful reference semantics
and the batching is an orthogonal optimization, documented not hidden.

Iterative by construction (each merge depends on the last), so there
is no single-statement SQL twin — correctness is pinned against a
pure-Python reference implementation in ``tests/test_ops_bpe.py``
(merge-list equality, per-document token equality, partitioning
invariance, round-trip reconstruction).

No reference analogue: the reference engine (yahoo/maha) has no
tokenizer surface; this op belongs to the training-data-pipeline axis
of the brief, next to ``ops/packing.py``'s token budgeting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load_table, words_sql

#: end-of-word marker appended as a separate terminal symbol (Sennrich's
#: '</w>': lets the model distinguish "est" in "longest" from "est." as
#: a word ending, and makes detokenization lossless)
EOW = "</w>"
#: default merge budget for the registry-entry pipeline (small corpus;
#: production vocabularies use 16k-64k)
BPE_MERGES = 40
#: stop when the best pair's weighted count falls below this
BPE_MIN_COUNT = 2


def word_frequencies(docs: DataFrame) -> DataFrame:
    """``(word, freq)`` — the single corpus-sized pass of BPE training."""
    return (docs.selectExpr(f"explode({words_sql()}) AS word")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _initial_vocab(word_freqs: DataFrame) -> DataFrame:
    """``(syms, freq)`` — each word split to single-character symbols
    plus the terminal ``EOW`` marker."""
    return word_freqs.selectExpr(
        "concat(transform(sequence(1, length(word)), "
        f"i -> substring(word, i, 1)), array('{EOW}')) AS syms",
        "freq")


def _merge_expr(col, a: str, b: str):
    """Left-fold that greedily merges every leftmost ``(a, b)`` adjacency
    in a symbol array into ``a || b`` — pure codegen, literals passed as
    ``lit`` (no SQL-string splicing of corpus-derived text)."""
    return F.aggregate(
        col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(x))))


def bpe_train(word_freqs: DataFrame, n_merges: int = BPE_MERGES,
              min_count: int = BPE_MIN_COUNT) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges; returns the ordered merge list.

    Deterministic: pair selection orders by (count DESC, a ASC, b ASC),
    so the result is independent of partitioning and run order (pinned
    by the invariance test). Stops early when the best remaining pair's
    weighted count drops below ``min_count``.
    """
    vocab = _initial_vocab(word_freqs).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (vocab.filter(F.size("syms") >= 2)
                   .selectExpr("freq", "syms",
                               "explode(sequence(1, size(syms) - 1)) AS i")
                   .selectExpr("syms[i - 1] AS a", "syms[i] AS b", "freq")
                   .groupBy("a", "b").agg(F.sum("freq").alias("cnt"))
                   .orderBy(F.col("cnt").desc(), "a", "b")
                   .limit(1).collect())
            if not top or top[0].cnt < min_count:
                break
            a, b = top[0].a, top[0].b
            merges.append((a, b))
            nxt = (vocab.select(_merge_expr(F.col("syms"), a, b)
                                .alias("syms"), "freq")
                   .localCheckpoint(eager=True))
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


def _encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the merge list in rank order (greedy leftmost per rank) —
    the trainer's own semantics, shared with the Python test twin."""
    syms = list(word) + [EOW]
    for a, b in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode_frame(docs: DataFrame,
                     merges: list[tuple[str, str]]) -> DataFrame:
    """``(doc_id, tokens, n_tokens)`` — each document's whitespace words
    subword-encoded under the learned merges (Arrow-batched pandas UDF
    with a per-executor word memo; the merge list rides the closure —
    broadcast once per executor, bounded by the merge budget)."""
    from pyspark.sql.functions import pandas_udf

    frozen = list(merges)

    @pandas_udf("array<string>")
    def encode(texts):
        import pandas as pd
        memo: dict[str, list[str]] = {}

        def enc(text):
            toks: list[str] = []
            for w in text.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, frozen)
                toks.extend(got)
            return toks

        return pd.Series([enc(t) for t in texts])

    return (docs.withColumn("tokens", encode(F.col("text")))
            .selectExpr("doc_id", "tokens", "size(tokens) AS n_tokens"))


def bpe_pipeline(spark: SparkSession, sf_dir: str,
                 n_merges: int = BPE_MERGES) -> DataFrame:
    """Registry entry (``(spark, sf_dir)`` signature family): train on
    the ``documents`` table and return its encoding — the end-to-end
    tokenizer-fitting job."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(word_frequencies(docs), n_merges=n_merges)
    return bpe_encode_frame(docs, merges).orderBy("doc_id")
