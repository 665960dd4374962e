"""SemDeDup — semantic deduplication over embedding clusters (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540).

The scaling idea: exact all-pairs cosine dedup is quadratic in the
corpus, so first k-means-cluster the embeddings and only compare WITHIN
each cluster — semantic duplicates land in the same cluster with high
probability, and the pairwise work drops from O(n^2) to O(n^2 / k) (the
paper runs 50k clusters over LAION-scale corpora).  This complements
``dedup_embed_cosine`` (exact, block-partitioned) the way IVF
complements brute-force top-k: same measure, sub-linear candidate set.

Keep rule (deterministic variant of the paper's): within a cluster,
order members by cosine-to-centroid DESC (vec_id ASC tie-break); a
member is a duplicate iff some EARLIER member is >= ``eps`` similar.
Each near-dup group therefore keeps exactly one representative — the
member closest to the centroid.  (The paper found keep-closest /
keep-farthest / keep-random within eps-groups to be near-equivalent:
§4.3; closest-to-centroid is the deterministic choice.)

100 TB path: centroid training and assignment are broadcast joins +
groupBy means (``similarity.ivf_centroids`` — k rows broadcast, corpus
streamed); the per-cluster kernel is an Arrow-batched
``applyInPandas`` whose unit of work is one cluster, so ``k`` is chosen
to bound cluster size to worker memory (n/k vectors * dim * 8 B; the
paper's 50k clusters keep this in the tens of MB at web scale).  A
pathologically hot cluster is the one skew risk — mitigated by
``max_cell_size``: cells over the cap are recursively re-clustered
(``_assign_bounded``, the same trick FAISS uses for imbalanced IVF
lists), with a loud raise if a cell of identical vectors cannot be
split.  ``semdedup_sql_frame`` is the join-spelled twin that has no
per-worker matrix at all (and bit-matches the DuckDB oracle).

No reference analogue (yahoo/maha has no embedding surface); this op
belongs to the training-data-pipeline axis, next to ``ops/dedup.py``
and ``ops/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import load_table, scoped_cache
from .similarity import IVF_CELLS, _ivf_assign, ivf_centroids

#: cosine threshold above which two same-cluster members are semantic
#: duplicates. The paper sweeps 0.7-0.95 on real embedding models; the
#: synthetic test corpus is near-orthogonal with planted similarity at
#: ~0.45 (see ``PAIR_COS_T``), so the default aligns there to stay
#: nonvacuous on the driver corpus.
SEMDEDUP_EPS = 0.45
#: recursive-split rounds before declaring a cell un-splittable (a cell
#: of > max_cell_size IDENTICAL vectors cannot be split by any
#: clustering — every member ties to the same sub-centroid)
SPLIT_ROUNDS = 6

_OUT_SCHEMA = ("vec_id BIGINT, cell INT, cent_sim DOUBLE, "
               "max_prior_sim DOUBLE, keep BOOLEAN")


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """``(vec_id, embedding, cell, centroid)`` — each vector with its
    nearest-centroid cell and that cell's centroid attached (broadcast —
    k rows), so every downstream kernel is self-contained per cluster."""
    from pyspark.sql import functions as F
    return (_ivf_assign(emb, cents, probe=1)
            .select("vec_id", "embedding", "cell")
            .join(F.broadcast(cents), "cell")
            .select("vec_id", "embedding", "cell", "centroid"))


def _assign_bounded(emb: DataFrame, cents: DataFrame,
                    max_cell_size: int) -> DataFrame:
    """``_assign`` with the hot-cluster guard: any cell over
    ``max_cell_size`` members is recursively re-clustered
    (``ivf_centroids`` over the oversized cell's members — the FAISS
    trick for imbalanced IVF lists), so the per-cluster Arrow kernel's
    m x m gram matrix stays bounded by the cap. Sub-cells get fresh
    integer ids past the current maximum; each member's ``centroid`` is
    its SUB-cluster's centroid (the keep rule orders within the
    sub-cluster, which is the cluster that actually bounds the pairwise
    comparison). Raises after ``SPLIT_ROUNDS`` if a cell cannot be
    split below the cap (> cap identical vectors) — a loud error beats
    OOMing a worker.

    Driver-side cost: one k-row ``collect`` of cell sizes per round;
    everything else is DataFrame ops (``localCheckpoint`` per round
    truncates the union lineage, same precedent as
    ``dedup.near_dup_clusters``)."""
    from pyspark.sql import functions as F

    assigned = _assign(emb, cents)
    for _ in range(SPLIT_ROUNDS):
        sizes = {r["cell"]: r["n"] for r in
                 assigned.groupBy("cell")
                 .agg(F.count(F.lit(1)).alias("n")).collect()}
        hot = sorted(c for c, n in sizes.items() if n > max_cell_size)
        if not hot:
            return assigned
        next_cell = max(sizes) + 1
        parts = [assigned.filter(~F.col("cell").isin([int(c) for c in hot]))]
        for c in hot:
            members = (assigned.filter(F.col("cell") == int(c))
                       .select("vec_id", "embedding"))
            sub_k = min(max(2, -(-sizes[c] // max_cell_size) * 2), sizes[c])
            sub = ivf_centroids(members, k=sub_k).selectExpr(
                f"CAST(cell + {next_cell} AS INT) AS cell", "centroid")
            next_cell += sub_k
            parts.append(_assign(members, sub))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        assigned = out.localCheckpoint()
    worst = (assigned.groupBy("cell").count()
             .agg(F.max("count")).first()[0])
    if worst > max_cell_size:
        raise ValueError(
            f"semdedup: a cluster of {worst} members cannot be split "
            f"below max_cell_size={max_cell_size} after {SPLIT_ROUNDS} "
            "rounds — the cell contains more identical (or cosine-"
            "indistinguishable) vectors than the cap; raise the cap or "
            "exact-dedup the corpus first")
    return assigned


def semdedup_frame(emb: DataFrame, cents: DataFrame,
                   eps: float = SEMDEDUP_EPS,
                   max_cell_size: int | None = None) -> DataFrame:
    """``(vec_id, cell, cent_sim, max_prior_sim, keep)`` — one row per
    vector; ``keep=false`` marks semantic duplicates.

    ``cents`` is a ``(cell, centroid)`` frame (``ivf_centroids`` or a
    persisted index's centroids) — passing it in keeps the kernel
    reusable over a frozen index and lets tests feed both the op and an
    independent oracle the same centroids.

    All float math happens inside the kernel in float64 numpy so the
    result is a pure function of (embeddings, centroids): cosine to
    centroid for the ordering, one m x m gram matrix for the pairwise
    sims, both rounded to 6 decimals before the eps comparison so the
    reported values and the keep decision are consistent.

    ``max_cell_size`` bounds the kernel's per-cluster gram matrix: cells
    over the cap are recursively re-clustered (``_assign_bounded``)
    before the kernel runs — the hot-cluster guard for skewed corpora.
    """
    import numpy as np
    import pandas as pd

    assigned = (_assign(emb, cents) if max_cell_size is None
                else _assign_bounded(emb, cents, max_cell_size))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        cent = np.asarray(pdf["centroid"].iloc[0], dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        cent_sim = np.round(
            (mat @ cent) / (norms * np.sqrt(cent @ cent)), 6)
        order = np.lexsort((pdf["vec_id"].to_numpy(), -cent_sim))
        m = mat[order] / norms[order, None]
        sims = np.round(m @ m.T, 6)
        max_prior = np.full(len(order), -1.0)
        for i in range(1, len(order)):
            max_prior[i] = sims[i, :i].max()
        out = pd.DataFrame({
            "vec_id": pdf["vec_id"].to_numpy()[order],
            "cell": pdf["cell"].to_numpy()[order],
            "cent_sim": cent_sim[order],
            "max_prior_sim": max_prior,
            "keep": max_prior < eps,
        })
        return out

    return (assigned.groupBy("cell").applyInPandas(kernel, _OUT_SCHEMA)
            .orderBy("vec_id"))


def semdedup(spark: SparkSession, sf_dir: str,
             k: int = IVF_CELLS, eps: float = SEMDEDUP_EPS,
             max_cell_size: int | None = None) -> DataFrame:
    """SemDeDup over the ``embeddings`` table at the module defaults."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = scoped_cache(ivf_centroids(emb, k))
    return semdedup_frame(emb, cents, eps, max_cell_size=max_cell_size)


def semdedup_sql_frame(emb: DataFrame, cents: DataFrame,
                       eps: float = SEMDEDUP_EPS) -> DataFrame:
    """Pure-Catalyst twin of ``semdedup_frame`` — the keep rule as a
    within-cell self-join instead of the per-cluster Arrow kernel.

    Same output, different physical shape: the "max similarity to an
    EARLIER member" is a cell-keyed equi-join (a earlier than b by
    (cent_sim DESC, vec_id ASC)) + groupBy max, so no worker ever
    materializes an m x m matrix — a hot cell becomes a large streamed
    join AQE can skew-split, not an OOM. The kernel twin wins when
    clusters are many and small (one Arrow batch per cluster); this one
    is the contract/serving spelling because every float expression
    (``_cos_sql`` fold) carries the left-to-right association the DuckDB
    oracle reproduces bit-for-bit.
    """
    from pyspark.sql import functions as F

    from .similarity import _cos_sql

    # consumed three times (both self-join sides + the final left join):
    # cache so the assignment crossJoin + per-vec window runs once
    scored = scoped_cache(
        _ivf_assign(emb, cents, probe=1)
        .selectExpr("vec_id", "embedding", "cell",
                    "round(sim, 6) AS cent_sim"))
    a = scored.selectExpr("cell", "vec_id AS a_id", "embedding AS a_emb",
                          "cent_sim AS a_cs")
    b = scored.selectExpr("cell", "vec_id AS b_id", "embedding AS b_emb",
                          "cent_sim AS b_cs")
    cos_ab = _cos_sql("a_emb", "b_emb", one_based=False)
    prior = (a.join(b, "cell")
             .filter("a_cs > b_cs OR (a_cs = b_cs AND a_id < b_id)")
             .selectExpr("b_id AS vec_id", f"round({cos_ab}, 6) AS s")
             .groupBy("vec_id").agg(F.max("s").alias("mp")))
    return (scored.join(prior, "vec_id", "left")
            .selectExpr("vec_id", "cell", "cent_sim",
                        "coalesce(mp, CAST(-1.0 AS DOUBLE)) "
                        "AS max_prior_sim",
                        f"coalesce(mp, CAST(-1.0 AS DOUBLE)) < {eps} "
                        "AS keep")
            .orderBy("vec_id"))


def semdedup_op(spark: SparkSession, sf_dir: str,
                k: int = IVF_CELLS,
                eps: float = SEMDEDUP_EPS) -> DataFrame:
    """Driver-contract entry: SemDeDup with SEED centroids (``iters=0``
    — the k vectors with the smallest md5-derived sample key, no Lloyd
    iteration) and the SQL keep rule.

    Seed-only centroids are the bit-parity choice, not a shortcut: a
    Lloyd mean is a float SUM whose association order differs between
    Spark's partial aggregates and DuckDB's serial sum, so iterated
    centroids match only to ~1 ulp — seeds are raw stored vectors,
    identical bytes in both engines, and every downstream expression
    (assignment, cent_sim, pairwise cosine) is written with the shared
    left-to-right association (``dot64``/fold). The full Lloyd version
    stays pytest-pinned against the independent numpy oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = scoped_cache(ivf_centroids(emb, k, iters=0))
    return semdedup_sql_frame(emb, cents, eps)


def semdedup_oracle(k: int = IVF_CELLS,
                    eps: float = SEMDEDUP_EPS) -> str:
    """DuckDB twin of ``semdedup_op`` over the ``embeddings`` view.

    Mirrors, in order: the md5-sample seed selection (Spark's ``conv``
    hash is a decimal STRING, so the ORDER BY is lexicographic on the
    digits — reproduced via ``::BIGINT::VARCHAR``), cell numbering by
    first centroid coordinate, nearest-centroid assignment on the raw
    (unrounded) cosine with cell-asc tie-break, and the
    earlier-member-max keep rule over 6-dp-rounded cosines."""
    from .similarity import _cos_sql
    cos_ec = _cos_sql("e.embedding", "c.centroid", one_based=True)
    cos_ab = _cos_sql("a.embedding", "b.embedding", one_based=True)
    return f"""
        WITH seeds AS (
            SELECT vec_id AS seed_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE))
                       AS centroid
            FROM embeddings
            ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                          1, 7))::BIGINT AS VARCHAR),
                     vec_id
            LIMIT {k}
        ),
        cents AS (
            -- seed_id tie-break mirrors the Spark renumbering exactly:
            -- without it, seeds sharing a first coordinate get
            -- engine-dependent cell ids and the hash check diverges
            SELECT CAST(row_number() OVER (ORDER BY centroid[1], seed_id)
                        - 1 AS INT) AS cell,
                   centroid
            FROM seeds
        ),
        ranked AS (
            SELECT e.vec_id, e.embedding, c.cell, {cos_ec} AS sim,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos_ec} DESC, c.cell ASC) AS crank
            FROM embeddings e CROSS JOIN cents c
        ),
        scored AS (
            SELECT vec_id, embedding, cell, round(sim, 6) AS cent_sim
            FROM ranked WHERE crank = 1
        ),
        prior AS (
            SELECT b.vec_id AS vec_id, max(round({cos_ab}, 6)) AS mp
            FROM scored a JOIN scored b ON a.cell = b.cell
             AND (a.cent_sim > b.cent_sim
                  OR (a.cent_sim = b.cent_sim AND a.vec_id < b.vec_id))
            GROUP BY b.vec_id
        )
        SELECT s.vec_id, s.cell, s.cent_sim,
               coalesce(p.mp, CAST(-1.0 AS DOUBLE)) AS max_prior_sim,
               coalesce(p.mp, CAST(-1.0 AS DOUBLE)) < {eps} AS keep
        FROM scored s LEFT JOIN prior p ON s.vec_id = p.vec_id
        ORDER BY s.vec_id
    """
