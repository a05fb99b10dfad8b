"""Shared deterministic clustered-embedding generator for ANN/clustering
tests: vec_id i sits on unit centroid i % n_clusters plus seeded Gaussian
noise — reproducible ground-truth geometry."""

from __future__ import annotations

import numpy as np

DIM = 64
N_CLUSTERS = 20
NOISE = 0.044  # ⇒ E[cos(v, centroid)] ≈ 0.94, a realistic near-dup tightness


def clustered_corpus(spark, vec_ids, n_clusters: int = N_CLUSTERS, noise: float = NOISE):
    """Deterministic clustered re-embedding of the given vec_ids: unit
    centroids + seeded Gaussian noise, vec_id i in cluster i % n_clusters."""
    rs = np.random.RandomState(7)
    cent = rs.normal(size=(n_clusters, DIM))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    ids = sorted(vec_ids)
    noise_m = rs.normal(size=(len(ids), DIM)) * noise
    vecs = cent[[i % n_clusters for i in ids]] + noise_m
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id bigint, embedding array<double>",
    ).repartition(8)
