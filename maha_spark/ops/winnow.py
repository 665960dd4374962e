"""Winnowing document fingerprints — substring-overlap near-duplicate
detection (Schleimer, Wilkerson, Aiken: "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD'03 — the MOSS algorithm).

Exact-substring dedup is the training-data gap the signature family
(minhash / simhash / n-gram Jaccard in ``ops/dedup.py``) does not cover:
those measure whole-document set similarity, so a long verbatim passage
pasted into an otherwise-different document scores low on every one of
them.  Winnowing is position-aware: hash every k-gram, slide a window of
``w`` consecutive hashes, keep each window's minimum.  The selected set
has two properties the paper proves:

* **guarantee** — any shared word run of length >= ``w + k - 1`` yields
  at least one shared fingerprint (detection is lossless above the
  guarantee threshold, like PPJoin's prefix filter is for Jaccard);
* **density** — the expected fraction of positions selected is
  ``2 / (w + 1)``, so the signature is a small, tunable sample.

Pair scoring uses fingerprint *containment* ``|A ∩ B| / min(|A|, |B|)``
(the asymmetric measure used for contained-passage detection — a short
document pasted inside a long one still scores 1.0, where Jaccard
dilutes toward 0).

100 TB path: signature construction is pure per-row whole-stage codegen
(``transform`` over an index ``sequence`` — no explode of a computed
array, no shuffle); the only all-to-all operation is the equi-join on
fingerprint value, a shuffle keyed by 32-bit hashes whose fan-out is the
fingerprint's document frequency.  Boilerplate fingerprints (license
headers, navigation chrome) are the one skew risk at web scale — cap
them with ``max_fp_docs``, the standard MOSS noise guard (adds one
small groupBy on the fingerprint stream, exactly like the document-
frequency pass in ``dedup_ngram_jaccard``).

No reference analogue: the reference engine (yahoo/maha) has no corpus
dedup surface; this op belongs to the training-data-pipeline axis of
the brief, next to ``ops/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import (duck_h32_sql, duck_words_sql, h32_sql, load_table,
                     scoped_cache, words_sql)

#: k-gram length in words (the noise threshold: matches shorter than k
#: words are never reported)
WINNOW_K = 5
#: winnowing window — guarantee threshold is ``WINNOW_W + WINNOW_K - 1``
#: (= 8 words) and expected signature density is 2/(W+1) (= 40%)
WINNOW_W = 4
#: minimum fingerprint containment for a reported pair
WINNOW_T = 0.2
#: default document-frequency cap for the POSITIONAL matches entry: the
#: positional self-join keeps duplicates per position with no downstream
#: groupBy, so a boilerplate fingerprint in N docs at P positions each
#: emits ~(NP)^2 rows — the registry entry runs capped by default (the
#: set-semantics ``winnow_pairs`` entry stays uncapped for exact-MOSS
#: oracle parity; its groupBy bounds the blowup at shared-count rows)
WINNOW_MATCH_MAX_FP_DOCS = 50


def winnow_fingerprints(docs: DataFrame, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """``(doc_id, sz, fp)`` — one row per selected fingerprint.

    ``sz`` is the document's distinct-fingerprint count (the containment
    denominator), carried on every row so pair scoring needs no second
    join back to a per-document table.

    Documents shorter than ``k + w - 1`` words produce no k-gram window
    and are dropped — they are below the guarantee threshold, where
    winnowing's detection promise is void by construction.

    Plan shape: hashes and window minima are built with ``transform``
    over index ``sequence``s inside one projection (per-row codegen,
    zero shuffle); the explode follows the Generate-safe pattern — the
    generator iterates a cheap ``sequence(1, size(fps))`` while the
    computed ``fps`` array passes *through* the Generate as
    requiredChildOutput (evaluated once per input row), and the element
    is projected after (``tests/test_plan_shape.py`` pins the repo-wide
    rule).
    """
    return (
        _hash_frame(docs, k, w)
        .selectExpr(
            "doc_id",
            f"array_distinct(transform(sequence(1, size(hs) - {w} + 1), "
            f"j -> array_min(slice(hs, j, {w})))) AS fps")
        .selectExpr("doc_id", "fps", "size(fps) AS sz")
        .selectExpr("doc_id", "fps", "sz",
                    "explode(sequence(1, size(fps))) AS j")
        .selectExpr("doc_id", "sz", "fps[j-1] AS fp")
    )


def _hash_frame(docs: DataFrame, k: int, w: int) -> DataFrame:
    """``(doc_id, hs)`` — the per-document k-gram hash array, the shared
    scaffold under every winnowing variant (ONE spelling of the length
    filter and hash so the set/positional/oracle twins cannot drift)."""
    kgram = f"concat_ws(' ', slice(w, i, {k}))"
    return (docs.selectExpr("doc_id", f"{words_sql()} AS w")
            .filter(f"size(w) >= {k + w - 1}")
            .selectExpr(
                "doc_id",
                f"transform(sequence(1, size(w) - {k} + 1), "
                f"i -> {h32_sql(kgram)}) AS hs"))


def _oracle_hash_ctes(k: int, w: int) -> str:
    """The DuckDB twin of ``_hash_frame`` as the shared ``wd``/``g``
    CTE prefix of every winnowing oracle."""
    kgram = f"array_to_string(w[i:i+{k}-1], ' ')"
    return f"""
        wd AS (
            SELECT doc_id, {duck_words_sql()} AS w FROM documents
        ),
        g AS (
            SELECT doc_id,
                   list_transform(range(1, len(w) - {k} + 2),
                                  i -> {duck_h32_sql(kgram)}) AS hs
            FROM wd WHERE len(w) >= {k + w - 1}
        )"""


def winnow_pairs_frame(docs: DataFrame, k: int = WINNOW_K,
                       w: int = WINNOW_W, threshold: float = WINNOW_T,
                       max_fp_docs: int | None = None) -> DataFrame:
    """All document pairs with fingerprint containment >= ``threshold``.

    ``max_fp_docs`` drops fingerprints shared by more than that many
    documents before the pair join (boilerplate guard — None keeps the
    exact MOSS set semantics the DuckDB oracle mirrors).
    """
    from pyspark.sql import functions as F
    # consumed twice (both sides of the pair self-join): cache so the
    # md5 k-gram chain runs once — same precedent as ngram_jaccard's
    # token frames; at web scale this is the winnowed signature stream
    # (~2/(w+1) of the k-gram count), MEMORY_AND_DISK spills safely.
    # scoped_cache registers it for release_scoped_caches() so a
    # long-lived session doesn't accumulate blocks across jobs
    fps = scoped_cache(winnow_fingerprints(docs, k, w))
    if max_fp_docs is not None:
        hot = (fps.groupBy("fp")
               .agg(F.count(F.lit(1)).alias("fp_df"))
               .filter(f"fp_df > {int(max_fp_docs)}")
               .select("fp"))
        fps = fps.join(hot, "fp", "left_anti")
    a = fps.selectExpr("fp", "doc_id AS a_id", "sz AS a_sz")
    b = fps.selectExpr("fp", "doc_id AS b_id", "sz AS b_sz")
    return (
        a.join(b, "fp").filter("a_id < b_id")
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("shared"),
             F.first("a_sz").alias("a_sz"),
             F.first("b_sz").alias("b_sz"))
        .selectExpr(
            "a_id", "b_id", "shared",
            "round(CAST(shared AS DOUBLE) / least(a_sz, b_sz), 6) "
            "AS containment")
        .filter(f"containment >= {threshold}")
    )


def winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: winnowed substring-overlap pairs over the
    ``documents`` table at the module defaults."""
    return winnow_pairs_frame(load_table(spark, sf_dir, "documents"))


def winnow_fingerprints_positional(docs: DataFrame, k: int = WINNOW_K,
                                   w: int = WINNOW_W) -> DataFrame:
    """``(doc_id, fp, pos)`` — every position (1-based k-gram index)
    whose window-minimum fingerprint is selected, duplicates kept.

    The positional variant backs match AUDITING (where in each document
    the shared passage sits — MOSS's highlighting output), so unlike
    ``winnow_fingerprints`` it does not collapse to the distinct
    fingerprint set: the selected position is the ARGMIN of each
    window (earliest position on hash ties — both engines break ties
    the same way because the scan is left-to-right over identical
    hashes)."""
    # argmin by scanning the window slice once: array_position of the
    # min within the window, offset by the window start
    sel = (f"transform(sequence(1, size(hs) - {w} + 1), "
           f"j -> j - 1 + CAST(array_position("
           f"slice(hs, j, {w}), array_min(slice(hs, j, {w}))) AS INT))")
    return (
        _hash_frame(docs, k, w)
        .selectExpr("doc_id", "hs",
                    f"array_distinct({sel}) AS sel")
        .selectExpr("doc_id", "hs", "sel",
                    "explode(sequence(1, size(sel))) AS j")
        .selectExpr("doc_id", "hs[sel[j-1]-1] AS fp", "sel[j-1] AS pos")
    )


def winnow_matches_frame(docs: DataFrame, k: int = WINNOW_K,
                         w: int = WINNOW_W,
                         max_fp_docs: int | None = None) -> DataFrame:
    """Shared-fingerprint occurrences with POSITIONS:
    ``(a_id, b_id, fp, a_pos, b_pos)`` — one row per cross-document
    co-occurrence of a selected fingerprint, i.e. a shared word run of
    length >= k starting at ``a_pos``/``b_pos`` (1-based word index) in
    the respective documents. This is the audit/highlight output that
    sits under ``winnow_pairs``'s aggregate containment score.

    ``max_fp_docs`` (documents per fingerprint, like
    ``winnow_pairs_frame``'s guard) matters MORE here: the positional
    self-join keeps duplicates per position with no downstream groupBy,
    so a boilerplate fingerprint in N docs at P positions each emits
    ~(NP)² rows — cap it at web scale."""
    from pyspark.sql import functions as F
    fps = scoped_cache(winnow_fingerprints_positional(docs, k, w))
    if max_fp_docs is not None:
        hot = (fps.select("doc_id", "fp").distinct()
               .groupBy("fp")
               .agg(F.count(F.lit(1)).alias("fp_df"))
               .filter(f"fp_df > {int(max_fp_docs)}")
               .select("fp"))
        fps = fps.join(hot, "fp", "left_anti")
    a = fps.selectExpr("fp", "doc_id AS a_id", "pos AS a_pos")
    b = fps.selectExpr("fp", "doc_id AS b_id", "pos AS b_pos")
    return (a.join(b, "fp").filter("a_id < b_id")
            .select("a_id", "b_id", "fp", "a_pos", "b_pos"))


def winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (``(spark, sf_dir)`` signature family): positional
    matches over the ``documents`` table at the module defaults — capped
    at ``WINNOW_MATCH_MAX_FP_DOCS`` docs per fingerprint (the (NP)^2
    boilerplate guard the frame docstring warns about)."""
    return winnow_matches_frame(load_table(spark, sf_dir, "documents"),
                                max_fp_docs=WINNOW_MATCH_MAX_FP_DOCS)


# the benchmark split carve is IMPORTED from the n-gram collision
# detector so the two stay structurally in lockstep (both docstrings
# promise identical inputs)
from .contamination import BENCH_MOD as WINNOW_BENCH_MOD  # noqa: E402
#: candidate flagged when this fraction of its fingerprints hits the
#: benchmark fingerprint set
WINNOW_CONTAM_T = 0.2


def winnow_contamination(spark: SparkSession, sf_dir: str,
                         k: int = WINNOW_K, w: int = WINNOW_W,
                         threshold: float = WINNOW_CONTAM_T) -> DataFrame:
    """Passage-level benchmark decontamination via winnowed
    fingerprints: ``(doc_id, sz, hits, containment, contaminated)`` per
    candidate document (the benchmark split is carved
    ``doc_id % WINNOW_BENCH_MOD == 0``, mirroring
    ``ops/contamination.py`` so both detectors see identical inputs).

    Relation to the n-gram-collision detector: that one checks EVERY
    shingle occurrence against the benchmark set; winnowing checks only
    the ~``2/(w+1)`` window-minimum sample — 40% of the shingle volume
    at the defaults — while KEEPING a detection guarantee (any shared
    run of >= w+k-1 words produces a shared fingerprint). At 100 TB
    that is the same broadcast-semi-join shape with a provably
    sufficient fraction of the probe work; the benchmark side is an
    eval set, bounded by construction, so its distinct-fingerprint set
    broadcasts exactly like the shingle set does."""
    from pyspark.sql import functions as F
    # consumed twice (benchmark set, candidate pass): cache so the md5
    # k-gram chain — the dominant cost — runs once
    fps = scoped_cache(winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), k, w))
    is_bench = f"doc_id % {WINNOW_BENCH_MOD} = 0"
    bench = (fps.filter(is_bench).select("fp").distinct()
             .withColumn("__hit", F.lit(1)))
    cand = fps.filter(f"NOT ({is_bench})")
    # ONE pass over the candidate fingerprints (guide §1.2): bench is
    # DISTINCT on fp, so the broadcast left join cannot change row
    # counts and SUM(__hit) == the old left-semi COUNT(*) — the per-doc
    # size and the hit count fold into a single groupBy instead of two
    # independent aggregations joined back (same recipe as
    # ops/contamination.py's report)
    per_doc = (cand.join(F.broadcast(bench), "fp", "left")
               .groupBy("doc_id")
               .agg(F.first("sz").alias("sz"),
                    F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                     .alias("hits")))
    return (per_doc
            .selectExpr(
                "doc_id", "sz", "CAST(hits AS BIGINT) AS hits",
                "round(CAST(hits AS DOUBLE) / sz, 6) AS containment")
            .selectExpr("doc_id", "sz", "hits", "containment",
                        f"containment >= {threshold} AS contaminated"))


def winnow_contamination_oracle(k: int = WINNOW_K, w: int = WINNOW_W,
                                threshold: float = WINNOW_CONTAM_T) -> str:
    return f"""
        WITH {_oracle_hash_ctes(k, w)},
        f AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, len(hs) - {w} + 2),
                       j -> list_aggregate(hs[j:j+{w}-1], 'min'))) AS fps
            FROM g
        ),
        e AS (SELECT doc_id, len(fps) AS sz, unnest(fps) AS fp FROM f),
        bench AS (SELECT DISTINCT fp FROM e WHERE doc_id % {WINNOW_BENCH_MOD} = 0),
        cand AS (SELECT * FROM e WHERE doc_id % {WINNOW_BENCH_MOD} != 0),
        h AS (
            SELECT c.doc_id, any_value(c.sz) AS sz,
                   count(b.fp) AS hits
            FROM cand c LEFT JOIN bench b ON c.fp = b.fp
            GROUP BY c.doc_id
        )
        SELECT doc_id, sz, hits,
               round(CAST(hits AS DOUBLE) / sz, 6) AS containment,
               round(CAST(hits AS DOUBLE) / sz, 6) >= {threshold}
                   AS contaminated
        FROM h
    """


def winnow_matches_oracle(
        k: int = WINNOW_K, w: int = WINNOW_W,
        max_fp_docs: int | None = WINNOW_MATCH_MAX_FP_DOCS) -> str:
    """DuckDB twin of ``winnow_matches`` over the ``documents`` view
    (same default df cap as the registry entry; pass ``None`` for the
    uncapped frame)."""
    sel = (f"list_distinct(list_transform(range(1, len(hs) - {w} + 2), "
           f"j -> j - 1 + list_position(hs[j:j+{w}-1], "
           f"list_aggregate(hs[j:j+{w}-1], 'min'))))")
    cap = ""
    if max_fp_docs is not None:
        cap = f"""AND a.fp NOT IN (
                SELECT fp FROM e
                GROUP BY fp
                HAVING count(DISTINCT doc_id) > {int(max_fp_docs)})"""
    return f"""
        WITH {_oracle_hash_ctes(k, w)},
        s AS (SELECT doc_id, hs, {sel} AS sel FROM g),
        e AS (
            SELECT doc_id, hs[p] AS fp, p AS pos
            FROM (SELECT doc_id, hs, unnest(sel) AS p FROM s)
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.fp AS fp,
               a.pos AS a_pos, b.pos AS b_pos
        FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id {cap}
    """


def winnow_pairs_oracle(k: int = WINNOW_K, w: int = WINNOW_W,
                        threshold: float = WINNOW_T) -> str:
    """Identical computation in DuckDB: 1-based inclusive list slices
    (``l[i:i+k-1]`` == Spark ``slice(l, i, k)``), exclusive-end
    ``range`` (``range(1, m + 1)`` == Spark ``sequence(1, m)``), the
    same md5-derived 32-bit hash, and the same left-to-right double
    division — results are bit-equal."""
    return f"""
        WITH {_oracle_hash_ctes(k, w)},
        f AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, len(hs) - {w} + 2),
                       j -> list_aggregate(hs[j:j+{w}-1], 'min'))) AS fps
            FROM g
        ),
        e AS (SELECT doc_id, len(fps) AS sz, unnest(fps) AS fp FROM f)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               count(*) AS shared,
               round(CAST(count(*) AS DOUBLE)
                     / least(any_value(a.sz), any_value(b.sz)), 6)
                   AS containment
        FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING containment >= {threshold}
    """
