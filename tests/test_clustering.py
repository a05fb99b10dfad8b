"""k-means correctness: q96 is rows-only in the driver gate (iterative
fixpoint — no single SQL equivalent), so this is its accountability layer:
on the deterministic clustered corpus (known ground truth) Lloyd's must
recover the planted clusters almost perfectly, and the assignment must be
reproducible run-to-run."""

from __future__ import annotations

from collections import Counter

from spark_hadoop_automation_in_cloud_spark.operators.clustering import kmeans_assign
from tests.clustered import clustered_corpus


def _purity(rows, n_clusters):
    """Fraction of points whose cluster's majority ground-truth label is
    their own label (label = vec_id % n_clusters)."""
    by_cluster: dict[int, Counter] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, Counter())[r.vec_id % n_clusters] += 1
    majority = sum(c.most_common(1)[0][1] for c in by_cluster.values())
    return majority / len(rows)


def test_kmeans_recovers_planted_clusters(spark):
    emb = clustered_corpus(spark, range(300), n_clusters=8)
    out = kmeans_assign(emb, k=8, max_iter=5).collect()
    assert len(out) == 300
    assert _purity(out, 8) >= 0.95, _purity(out, 8)


def test_kmeans_deterministic(spark):
    emb = clustered_corpus(spark, range(120), n_clusters=8)
    a = {(r.vec_id, r.cluster_id, r.sq_dist) for r in kmeans_assign(emb, k=4, max_iter=3).collect()}
    b = {(r.vec_id, r.cluster_id, r.sq_dist) for r in kmeans_assign(emb, k=4, max_iter=3).collect()}
    assert a == b
