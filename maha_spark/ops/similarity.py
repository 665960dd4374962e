"""Similarity search over the ``embeddings`` table (``array<float>`` 64-d).

- ``sim_topk``: brute-force cosine top-k — the exactness baseline.  The
  dot product is written as an explicit 64-term sum (identical IEEE
  association order in Spark and DuckDB, so values hash-match).  At scale
  this is the O(n*q) reference path; use the LSH variant for 100 TB.
- ``sim_pairs``: all near-duplicate pairs above a cosine threshold.
- ``sim_lsh_buckets``: random-hyperplane LSH bucketing (8 planes derived
  deterministically from md5, so both engines agree bit-for-bit).  The
  bucket histogram is the oracle-checked output; ``sim_ann_topk`` then
  searches within buckets only (approximate, rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import dot64_sql, load_table

TOPK = 5
PAIR_COS_T = 0.95
N_PLANES = 8
DIM = 64
# cap the query side of the brute-force top-k: keeps the demo O(q*n)
# rather than O(n^2) as sf grows (the LSH path is the full-corpus answer)
MAX_QUERY_ID = 1000


def _norm_sql(v: str, one_based: bool) -> str:
    return f"sqrt({dot64_sql(v, v, one_based, 'DOUBLE')})"


def _cos_sql(a: str, b: str, one_based: bool) -> str:
    return (f"({dot64_sql(a, b, one_based, 'DOUBLE')} "
            f"/ ({_norm_sql(a, one_based)} * {_norm_sql(b, one_based)}))")


# ---------------------------------------------- vectorized kernel
def _corpus_matrix(emb_df) -> "tuple":
    """Collect (ids, float64 matrix, norms) for the broadcast side.

    The corpus (indexed side) is broadcast to every task as a dense numpy
    matrix; queries stream through mapInPandas in Arrow batches.  At
    cluster scale the corpus side is tiled (one broadcast per tile, union
    the results) — the kernel below is unchanged.
    """
    import numpy as np
    rows = emb_df.selectExpr("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.array([list(rows[i][1]) for i in order], dtype=np.float64)
    return ids, mat, _np_norms(mat)


def _np_dots(q: "object", mat: "object") -> "object":
    """Dot products of one query against every corpus row, accumulated
    dim-by-dim left-to-right — the exact IEEE association order of the
    explicit 64-term SQL sum (dot64_sql), so results hash-match the
    DuckDB oracle bit-for-bit."""
    acc = q[0] * mat[:, 0]
    for c in range(1, mat.shape[1]):
        acc = acc + q[c] * mat[:, c]
    return acc


def _np_norms(mat: "object") -> "object":
    """sqrt of the left-to-right self-dot — IEEE-identical to
    ``sqrt(dot64_sql(v, v))``."""
    import numpy as np
    acc = mat[:, 0] * mat[:, 0]
    for c in range(1, mat.shape[1]):
        acc = acc + mat[:, c] * mat[:, c]
    return np.sqrt(acc)


# ------------------------------------------------------------- top-k
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k, vectorized: corpus broadcast as a numpy
    matrix, queries stream through mapInPandas (Arrow batches), each task
    emits its local top-k — no pairwise shuffle at all.  The accumulation
    order matches the SQL oracle exactly (see _np_dots)."""
    import numpy as np
    import pandas as pd
    emb = load_table(spark, sf_dir, "embeddings")
    ids, mat, norms = _corpus_matrix(emb)
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def topk_batches(batches):
        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            out = []
            for qid, qv in zip(pdf["vec_id"], pdf["embedding"]):
                q = np.asarray(qv, dtype=np.float64)
                qn = np.sqrt(_np_dots(q, q[None, :])[0])
                cos = np.round(_np_dots(q, c_mat) / (qn * c_norms), 6)
                mask = c_ids != qid
                cand_ids, cand_cos = c_ids[mask], cos[mask]
                sel = np.lexsort((cand_ids, -cand_cos))[:TOPK]
                for rank, s in enumerate(sel, start=1):
                    out.append((qid, rank, cand_ids[s], cand_cos[s]))
            yield pd.DataFrame(out, columns=["qid", "rank", "nid", "cos_sim"])

    queries = emb.filter(f"vec_id < {MAX_QUERY_ID}")
    return queries.mapInPandas(
        topk_batches,
        schema="qid long, rank int, nid long, cos_sim double")


def sim_topk_oracle() -> str:
    cos = _cos_sql("a.embedding", "b.embedding", one_based=True)
    return f"""
        SELECT qid, rank, nid, cos_sim FROM (
            SELECT a.vec_id AS qid, b.vec_id AS nid,
                   round({cos}, 6) AS cos_sim,
                   row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY round({cos}, 6) DESC, b.vec_id ASC) AS rank
            FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
            WHERE a.vec_id < {MAX_QUERY_ID}
        ) WHERE rank <= {TOPK}
    """


# ------------------------------------------------------- near-dup pairs
def sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs above a cosine threshold, vectorized like sim_topk: each
    Arrow batch of left-side vectors scans the broadcast corpus and emits
    only the qualifying (a < b) pairs — the N^2 work is numpy inside the
    task, and nothing but matches hits the output."""
    import numpy as np
    import pandas as pd
    emb = load_table(spark, sf_dir, "embeddings")
    ids, mat, norms = _corpus_matrix(emb)
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def pair_batches(batches):
        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            out = []
            for a_id, av in zip(pdf["vec_id"], pdf["embedding"]):
                a = np.asarray(av, dtype=np.float64)
                an = np.sqrt(_np_dots(a, a[None, :])[0])
                cos = np.round(_np_dots(a, c_mat) / (an * c_norms), 6)
                mask = (c_ids > a_id) & (cos >= PAIR_COS_T)
                for b_id, cs in zip(c_ids[mask], cos[mask]):
                    out.append((a_id, b_id, cs))
            yield pd.DataFrame(out, columns=["a_id", "b_id", "cos_sim"])

    return emb.mapInPandas(
        pair_batches, schema="a_id long, b_id long, cos_sim double")


def sim_pairs_oracle() -> str:
    cos = _cos_sql("a.embedding", "b.embedding", one_based=True)
    return f"""
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round({cos}, 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round({cos}, 6) >= {PAIR_COS_T}
    """


# ------------------------------------------------------- hyperplane LSH
def _plane_weight(p: int, c: int) -> str:
    """Deterministic pseudo-random weight in [-1, 1) for plane p, dim c,
    derived from md5 of a literal tag — identical in any engine."""
    import hashlib
    h = int(hashlib.md5(f"plane{p}_{c}".encode()).hexdigest()[:7], 16)
    return repr(h / float(1 << 27) - 1.0)


def _bucket_sql(v: str, one_based: bool) -> str:
    lo = 1 if one_based else 0
    bits = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"{_plane_weight(p, c)} * CAST({v}[{lo + c}] AS DOUBLE)"
            for c in range(DIM))
        bits.append(f"(CASE WHEN ({terms}) >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    emb = load_table(spark, sf_dir, "embeddings")
    return (emb.selectExpr(
                f"{_bucket_sql('embedding', one_based=False)} AS bucket")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
            .orderBy("bucket"))


def sim_lsh_buckets_oracle() -> str:
    return f"""
        SELECT {_bucket_sql('embedding', one_based=True)} AS bucket,
               COUNT(*) AS n_vectors
        FROM embeddings GROUP BY 1 ORDER BY 1
    """


def sim_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: brute force restricted to same-LSH-bucket
    candidates. The 100 TB path: bucket is the shuffle key, so each
    partition does local top-k instead of an all-pairs cross join.
    Approximate by construction -> no SQL oracle (rows-only check)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    emb = load_table(spark, sf_dir, "embeddings")
    norm = _norm_sql("embedding", one_based=False)
    with_b = emb.selectExpr(
        "vec_id", "embedding", f"{norm} AS nrm",
        f"{_bucket_sql('embedding', one_based=False)} AS bucket")
    a = with_b.selectExpr("bucket", "vec_id AS qid", "embedding AS qv",
                          "nrm AS qn")
    b = with_b.selectExpr("bucket", "vec_id AS nid", "embedding AS nv",
                          "nrm AS nn")
    cos = f"({dot64_sql('qv', 'nv', False, 'DOUBLE')} / (qn * nn))"
    pairs = (a.join(b, "bucket").filter("qid != nid")
             .selectExpr("qid", "nid", f"round({cos}, 6) AS cos_sim"))
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("nid").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(f"rank <= {TOPK}")
            .select("qid", "rank", "nid", "cos_sim"))
