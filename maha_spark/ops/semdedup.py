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
pathologically hot cluster is the one skew risk — the mitigation is
recursive: re-run clustering inside any cluster over a size cap (the
same trick FAISS uses for imbalanced IVF lists); not needed at test
scale, documented here for the cluster-budget contract.

No reference analogue (yahoo/maha has no embedding surface); this op
belongs to the training-data-pipeline axis, next to ``ops/dedup.py``
and ``ops/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .common import load_table
from .similarity import IVF_CELLS, _ivf_assign, ivf_centroids

#: cosine threshold above which two same-cluster members are semantic
#: duplicates. The paper sweeps 0.7-0.95 on real embedding models; the
#: synthetic test corpus is near-orthogonal with planted similarity at
#: ~0.45 (see ``PAIR_COS_T``), so the default aligns there to stay
#: nonvacuous on the driver corpus.
SEMDEDUP_EPS = 0.45

_OUT_SCHEMA = ("vec_id BIGINT, cell INT, cent_sim DOUBLE, "
               "max_prior_sim DOUBLE, keep BOOLEAN")


def semdedup_frame(emb: DataFrame, cents: DataFrame,
                   eps: float = SEMDEDUP_EPS) -> DataFrame:
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
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    # attach each member's centroid (broadcast — k rows) so the kernel
    # is self-contained per cluster
    assigned = (_ivf_assign(emb, cents, probe=1)
                .select("vec_id", "embedding", "cell")
                .join(F.broadcast(cents), "cell")
                .select("vec_id", "embedding", "cell", "centroid"))

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
             k: int = IVF_CELLS, eps: float = SEMDEDUP_EPS) -> DataFrame:
    """SemDeDup over the ``embeddings`` table at the module defaults."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, k).cache()
    return semdedup_frame(emb, cents, eps)
