"""End-to-end corpus curation vs the composed DuckDB oracle."""

from __future__ import annotations


def test_curate_corpus_matches_oracle(spark, duck, sf_dir):
    from maha_spark.ops.pipeline import curate_corpus, curate_corpus_oracle

    got = [tuple(r) for r in curate_corpus(spark, sf_dir).collect()]
    want = [tuple(r) for r in duck.execute(curate_corpus_oracle()).fetchall()]

    def norm(rows):
        return sorted((int(a), int(b), int(c), round(float(d), 6), int(e),
                       f, g) for a, b, c, d, e, f, g in rows)

    assert norm(got) == norm(want)
    assert len(got) > 0


def test_curation_invariants(spark, sf_dir):
    from maha_spark.ops.dedup import dedup_clusters
    from maha_spark.ops.pipeline import QUALITY_MIN, curate_corpus

    kept = curate_corpus(spark, sf_dir).collect()
    by_cluster: dict = {}
    for r in kept:
        # one keeper per near-dup cluster
        assert r["cluster_id"] not in by_cluster
        by_cluster[r["cluster_id"]] = r
        assert r["quality_score"] >= QUALITY_MIN
        # the benchmark split (doc_id % 10 == 0) never survives
        assert r["doc_id"] % 10 != 0

    # keepers carry their cluster's true size
    sizes = {r["doc_id"]: r["cluster_size"]
             for r in dedup_clusters(spark, sf_dir).collect()}
    for r in kept:
        assert sizes[r["doc_id"]] == r["cluster_size"]
