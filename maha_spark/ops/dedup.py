"""Deduplication operators over the ``documents`` table.

Scale-first designs:

- ``dedup_exact`` / ``dedup_wordset``: one hash-groupBy shuffle keyed by a
  content fingerprint — the 100 TB path is a straight map-side-combine
  aggregation, no pairwise work.
- ``dedup_minhash_lsh``: shingle -> minhash signature (k=24) -> banded
  bucket join (b=12, r=2) -> exact-Jaccard verification of candidates.
  Work is proportional to bucket collisions, never all-pairs.  The DuckDB
  oracle computes the exact all-pairs answer; banding at r=2,b=12 has a
  false-negative probability of ~2e-9 at the 0.8 threshold, so the two
  agree.
- ``dedup_simhash`` / ``dedup_simhash_pairs``: 32-bit simhash; pair search
  partitions the fingerprint into 4 byte-chunks — any pair within hamming
  distance 3 shares at least one exact chunk (pigeonhole), so the banded
  join provably finds every qualifying pair.

All hashes derive from md5 hex (engine-portable); see common.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import (
    MINHASH_P, duck_h28_sql, duck_h32_sql, duck_words_sql, h28_sql, h32_sql,
    load_table, words_sql,
)

# minhash parameters: k = BANDS * ROWS signatures
BANDS = 12
ROWS = 2
JACCARD_T = 0.8
SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4
HAMMING_T = 3  # < SIMHASH_CHUNKS so the chunk join is lossless


# --------------------------------------------------------------- exact
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = load_table(spark, sf_dir, "documents")
    return (docs.selectExpr("md5(text) AS content_hash", "doc_id")
            .groupBy("content_hash")
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count(F.lit(1)).alias("dup_count")))


def dedup_exact_oracle() -> str:
    return """
        SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id,
               COUNT(*) AS dup_count
        FROM documents GROUP BY 1
    """


# ------------------------------------------------------------- wordset
def dedup_wordset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive fingerprint (sorted distinct words): catches
    shuffled/reordered duplicates exact dedup misses."""
    from pyspark.sql import functions as F
    docs = load_table(spark, sf_dir, "documents")
    fp = (f"md5(array_join(array_sort(array_distinct({words_sql()})), ' '))")
    return (docs.selectExpr(f"{fp} AS wordset_fp", "doc_id")
            .groupBy("wordset_fp")
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count(F.lit(1)).alias("dup_count"))
            .filter("dup_count > 1"))


def dedup_wordset_oracle() -> str:
    return f"""
        SELECT md5(array_to_string(list_sort(list_distinct(
                   {duck_words_sql()})), ' ')) AS wordset_fp,
               MIN(doc_id) AS keeper_doc_id, COUNT(*) AS dup_count
        FROM documents GROUP BY 1 HAVING COUNT(*) > 1
    """


# -------------------------------------------------------- minhash LSH
def _shingles_spark(words: str) -> str:
    """Distinct word 3-gram shingles (order-sensitive)."""
    return (f"array_distinct(transform(sequence(1, size({words}) - 2), "
            f"i -> concat_ws(' ', {words}[i-1], {words}[i], {words}[i+1])))")


def _shingles_duck(words: str) -> str:
    return (f"list_distinct(list_transform(range(1, len({words}) - 1), "
            f"i -> {words}[i] || ' ' || {words}[i+1] || ' ' || {words}[i+2]))")


def _minhash_sig_spark(sh: str) -> list[str]:
    # permutation i: (h28 * (2i+1) + 7919*i) mod P ; products < 2^34
    return [
        (f"array_min(transform({sh}, s -> ({h28_sql('s')} * {2 * i + 1} "
         f"+ {7919 * i}) % {MINHASH_P}))")
        for i in range(BANDS * ROWS)
    ]


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = (docs
            .selectExpr("doc_id", f"{words_sql()} AS w")
            # Spark's sequence(1, n) DESCENDS for n < 1 instead of returning
            # empty (DuckDB's range is empty) — guard short docs first
            .filter("size(w) >= 3")
            .selectExpr("doc_id", f"{_shingles_spark('w')} AS sh"))
    sigs = base.selectExpr(
        "doc_id", "sh",
        *[f"{e} AS mh{i}" for i, e in
          enumerate(_minhash_sig_spark("sh"))])
    band_cols = [
        f"named_struct('band', {b}, 'key', md5(concat_ws(',', "
        + ", ".join(f"mh{b * ROWS + r}" for r in range(ROWS)) + ")))"
        for b in range(BANDS)
    ]
    buckets = sigs.selectExpr(
        "doc_id", "sh",
        f"explode(array({', '.join(band_cols)})) AS bk")
    a = buckets.selectExpr("bk", "doc_id AS a_id")
    b = buckets.selectExpr("bk", "doc_id AS b_id")
    # dedupe candidate pairs on ids BEFORE attaching shingle sets: the
    # banded join multiplies pairs up to 12x and shuffling the (large)
    # shingle arrays through that would dominate the run
    cand = a.join(b, "bk").filter("a_id < b_id").select("a_id", "b_id").distinct()
    cand = (cand
            .join(base.selectExpr("doc_id AS a_id", "sh AS a_sh"), "a_id")
            .join(base.selectExpr("doc_id AS b_id", "sh AS b_sh"), "b_id"))
    jac = ("CAST(size(array_intersect(a_sh, b_sh)) AS DOUBLE) / "
           "(size(a_sh) + size(b_sh) - size(array_intersect(a_sh, b_sh)))")
    return (cand.selectExpr("a_id", "b_id", f"round({jac}, 6) AS jaccard")
            .filter(f"jaccard >= {JACCARD_T}"))


def dedup_minhash_lsh_oracle() -> str:
    w, dw = "w", _shingles_duck("w")
    inter = "len(list_intersect(a.sh, b.sh))"
    jac = (f"CAST({inter} AS DOUBLE) / "
           f"(len(a.sh) + len(b.sh) - {inter})")
    return f"""
        WITH s AS (
            SELECT doc_id, {dw} AS sh
            FROM (SELECT doc_id, {duck_words_sql()} AS {w} FROM documents)
            WHERE len({w}) >= 3
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               round({jac}, 6) AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE round({jac}, 6) >= {JACCARD_T}
    """


# ------------------------------------------------------------ simhash
def _simhash_expr_spark(dw: str) -> str:
    bit_sums = [
        (f"(CASE WHEN aggregate({dw}, 0, (acc, x) -> acc + "
         f"(CASE WHEN ({h32_sql('x')} div {1 << bit}) % 2 = 1 "
         f"THEN 1 ELSE -1 END)) > 0 THEN CAST({1 << bit} AS BIGINT) "
         f"ELSE CAST(0 AS BIGINT) END)")
        for bit in range(SIMHASH_BITS)
    ]
    return "(" + " + ".join(bit_sums) + ")"


def _simhash_expr_duck(dw: str) -> str:
    bit_sums = [
        (f"(CASE WHEN list_sum(list_transform({dw}, x -> "
         f"CASE WHEN ({duck_h32_sql('x')} // {1 << bit}) % 2 = 1 "
         f"THEN 1 ELSE -1 END)) > 0 THEN {1 << bit}::BIGINT "
         f"ELSE 0::BIGINT END)")
        for bit in range(SIMHASH_BITS)
    ]
    return "(" + " + ".join(bit_sums) + ")"


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (docs
            .selectExpr("doc_id",
                        f"array_distinct({words_sql()}) AS dw")
            .selectExpr("doc_id",
                        f"{_simhash_expr_spark('dw')} AS simhash"))


def dedup_simhash_oracle() -> str:
    return f"""
        SELECT doc_id, {_simhash_expr_duck('dw')} AS simhash
        FROM (SELECT doc_id, list_distinct({duck_words_sql()}) AS dw
              FROM documents)
    """


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = dedup_simhash(spark, sf_dir)
    chunks = sh.selectExpr(
        "doc_id", "simhash",
        "explode(array(" + ", ".join(
            f"named_struct('c', {c}, 'v', (simhash div {1 << (8 * c)}) % 256)"
            for c in range(SIMHASH_CHUNKS)) + ")) AS ck")
    a = chunks.selectExpr("ck", "doc_id AS a_id", "simhash AS a_sh")
    b = chunks.selectExpr("ck", "doc_id AS b_id", "simhash AS b_sh")
    return (a.join(b, "ck").filter("a_id < b_id")
            .selectExpr("a_id", "b_id",
                        "bit_count(a_sh ^ b_sh) AS hamming")
            .distinct()
            .filter(f"hamming <= {HAMMING_T}"))


def dedup_simhash_pairs_oracle() -> str:
    return f"""
        WITH s AS ({dedup_simhash_oracle()})
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_T}
    """
