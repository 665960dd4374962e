"""Benchmark-contamination detection over the ``documents`` table.

A training-data pipeline must exclude (or at least measure) documents
that overlap an evaluation benchmark. The standard check (GPT-3 appendix
C; PaLM §9; Dodge et al. 2021 "Documenting Large Webtext Corpora") is
n-gram collision: a candidate document is contaminated to the degree its
word n-grams also occur in the benchmark corpus.

Here the benchmark split is carved deterministically out of the corpus
itself (``doc_id % BENCH_MOD == 0``), which both exercises the operator
and gives the DuckDB oracle identical inputs.

Scale shape: candidate shingles explode to (doc_id, h) with md5-hashed
shingles (128-bit hash keys bound shuffle width no matter how long the
n-grams get); the benchmark shingle set is DISTINCT-collapsed and
broadcast — benchmarks are eval sets, bounded by construction (thousands
of documents), so the broadcast stays small even when the candidate side
is 100 TB. The join is a broadcast left-semi per shingle occurrence, then
one groupBy(doc_id). Nothing global, no Python, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import duck_words_sql, load_table, words_sql

#: doc_id % BENCH_MOD == 0 -> document belongs to the benchmark split
BENCH_MOD = 10
#: shingle width in words (13 is the GPT-3 setting; the synthetic corpus
#: averages ~60 words/doc, so 8 keeps per-doc shingle counts meaningful)
SHINGLE_N = 8


def _shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, h): one row per word-shingle occurrence, md5-hashed.

    Generated as explode(position indices) with the md5 computed AFTER
    the Generate — exploding a computed hash array re-evaluates the whole
    array per output row (see ops/text.py ``gram_rows_spark``).

    ``h`` is the RAW 16-byte digest (``unhex(md5(...))``), not the
    32-char hex string (r13, guide §2.3 "narrower types"): the digest
    is the widest column of the candidate DISTINCT exchange — the op's
    biggest shuffle — and unhex is a bijection on md5 output, so every
    distinct/join/count downstream is bit-identical while the key
    bytes halve (probe: tools/bench_probes/unhex_md5_r13.json)."""
    from pyspark.sql import functions as F
    n = SHINGLE_N
    # hash-partition by doc_id BEFORE the explode: the candidate side's
    # per-doc DISTINCT and both per-doc groupBys downstream cluster on
    # key sets containing doc_id, so this one exchange (carrying the
    # compact words arrays, not the 32-byte-hex shingle rows it
    # replaces) satisfies all of them — 3 Exchanges -> 1 on the
    # candidate subtree (guide §2.3/§2.4; r12 plan audit). The bench
    # side's DISTINCT(h) keeps its own (small) exchange as before.
    # applied to docs DIRECTLY (before the projection) so it sits
    # adjacent to load_table's harness-scale round-robin repartition and
    # CollapseRepartition folds the two into one exchange
    return (docs.repartition(F.col("doc_id"))
            .selectExpr("doc_id", f"{words_sql()} AS w")
            .selectExpr(
                "doc_id", "w",
                f"explode(CASE WHEN size(w) >= {n} THEN "
                f"sequence(1, size(w) - {n} + 1) ELSE "
                f"array() END) AS i")
            .selectExpr(
                "doc_id",
                f"unhex(md5(array_join(slice(w, i, {n}), ' '))) AS h"))


def contaminated_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Just the (doc_id) set of contaminated candidates — the shape the
    curation pipeline consumes (``pipeline.py`` anti-joins it). The full
    report below counts per-doc shingles and DISTINCTs every candidate
    (doc_id, h) pair; existence only needs the broadcast semi-join plus
    one doc_id distinct, so this skips the report's widest shuffle."""
    from pyspark.sql import functions as F

    sh_rows = _shingle_rows(load_table(spark, sf_dir, "documents"))
    bench_sh = (sh_rows.filter(F.col("doc_id") % BENCH_MOD == 0)
                .select("h").distinct())
    return (sh_rows.filter(F.col("doc_id") % BENCH_MOD != 0)
            .join(F.broadcast(bench_sh), "h", "left_semi")
            .select("doc_id").distinct())


def contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-document contamination report: distinct shingles,
    how many also occur anywhere in the benchmark split, the fraction,
    and the verdict (any hit = contaminated, the conservative filter)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    sh_rows = _shingle_rows(docs)

    bench_sh = (sh_rows.filter(F.col("doc_id") % BENCH_MOD == 0)
                .select("h").distinct())
    # per-doc DISTINCT occurrences (a shingle repeated within one doc
    # counts once, matching the oracle's set semantics)
    cand_sh = (sh_rows.filter(F.col("doc_id") % BENCH_MOD != 0)
               .distinct())

    # ONE pass over the candidate shingles: tag each distinct (doc_id, h)
    # with a broadcast membership flag and fold both per-doc aggregates
    # in the same groupBy — the previous split (a left-semi'd n_hit agg
    # PLUS an independent n_shingles agg, joined back) evaluated the
    # whole shingle-build + DISTINCT subtree twice and paid an extra
    # join (guide §1.2 "don't compute things twice", §2.4). The flag
    # join is the same broadcast the semi-join used: bench_sh is
    # DISTINCT on h, so a left join matches at most one row and row
    # counts are unchanged; SUM(flag) == the semi-join's COUNT(*).
    per_doc = (cand_sh
               .join(F.broadcast(bench_sh.withColumn("__hit", F.lit(1))),
                     "h", "left_outer")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_shingles"),
                    F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                    .alias("n_hit")))
    cand_ids = (docs.filter(F.col("doc_id") % BENCH_MOD != 0)
                .select("doc_id"))
    out = (cand_ids.join(per_doc, "doc_id", "left_outer")
           .withColumn("n_shingles",
                       F.coalesce(F.col("n_shingles"), F.lit(0)))
           .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0))))
    return (out.withColumn(
                "contaminated_frac",
                F.round(F.when(F.col("n_shingles") > 0,
                               F.col("n_hit").cast("double")
                               / F.col("n_shingles"))
                        .otherwise(F.lit(0.0)), 6))
            .withColumn("is_contaminated",
                        (F.col("n_hit") > 0).cast("int")))


def contamination_oracle() -> str:
    return f"""
        WITH words AS (
            SELECT doc_id, {duck_words_sql()} AS w FROM documents
        ), sh AS (
            SELECT doc_id,
                   md5(array_to_string(w[i:i + {SHINGLE_N - 1}], ' ')) AS h
            FROM (SELECT doc_id, w,
                         unnest(range(1, len(w) - {SHINGLE_N} + 2)) AS i
                  FROM words)
        ), bench AS (
            SELECT DISTINCT h FROM sh WHERE doc_id % {BENCH_MOD} = 0
        ), cand AS (
            SELECT DISTINCT doc_id, h FROM sh
            WHERE doc_id % {BENCH_MOD} <> 0
        ), per_doc AS (
            SELECT doc_id, COUNT(*) AS n_shingles,
                   SUM(CASE WHEN h IN (SELECT h FROM bench)
                            THEN 1 ELSE 0 END) AS n_hit
            FROM cand GROUP BY 1
        )
        SELECT w.doc_id,
               COALESCE(p.n_shingles, 0) AS n_shingles,
               CAST(COALESCE(p.n_hit, 0) AS BIGINT) AS n_hit,
               round(CASE WHEN COALESCE(p.n_shingles, 0) > 0
                          THEN CAST(p.n_hit AS DOUBLE) / p.n_shingles
                          ELSE 0.0 END, 6) AS contaminated_frac,
               CAST(COALESCE(p.n_hit, 0) > 0 AS INT) AS is_contaminated
        FROM words w LEFT JOIN per_doc p ON w.doc_id = p.doc_id
        WHERE w.doc_id % {BENCH_MOD} <> 0
    """
