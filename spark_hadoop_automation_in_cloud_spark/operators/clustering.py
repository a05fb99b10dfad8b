"""Distributed Lloyd's k-means over an embedding column.

The iterative-broadcast pattern: model state (k × dim centroids — a few KB)
lives on the driver; per iteration the centroids broadcast out, every
vector computes its nearest centroid JVM-side (``F.aggregate`` dot
products — no Python in the per-row path), and the new centroids come back
as ONE aggregation (dimension-exploded partial means).  The corpus is
scanned k_iter times but never shuffled at full width, and nothing
per-row ever reaches the driver — the only ``collect()`` is k·dim
centroid means per round, which is model state, not data.

Determinism: seeds are the k lowest-id vectors (no RNG), ties in the
nearest-centroid argmin break toward the lowest cluster id via the
``min_by`` struct ordering, and mean accumulation uses exact
micro-quantized integers so centroid drift cannot depend on partition
order.  Same input → same clustering, every run, any parallelism.

Scale: per iteration one broadcast (k·dim doubles), one map-side-combined
aggregation of k·dim partial sums.  At 100 TB with k=1024, dim=1024 the
broadcast is 8 MB and the aggregate state is bounded by k·dim — both
constant in corpus size.  Cache the input before calling when it is a
recomputed intermediate; the iterations rescan it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: mean quantization: partial sums accumulate value*1e6 as DECIMAL(38,0);
#: exact and order-independent, then one double division at the end.
_Q = 1_000_000


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to one of ``k`` Lloyd's clusters.

    Output: ``id_col``, ``cluster_id`` (int), ``sq_dist`` (squared L2 to
    the final centroid, rounded 6dp).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = emb.sparkSession
    # All distance/mean arithmetic in DOUBLE from the start: float32→double
    # widening is exact, and a single arithmetic type is what lets the
    # DuckDB oracle (q96) reproduce the trajectory bit-for-bit — mixed
    # float/double subtraction would round differently per engine.
    emb = emb.withColumn(vec_col, F.col(vec_col).cast("array<double>"))

    # k lowest-id seeds via orderBy+limit → TakeOrderedAndProject: a
    # distributed per-partition top-k merged on the driver.  (A global
    # row_number() window would move the WHOLE corpus to one partition —
    # the exact anti-pattern this operator otherwise avoids.)  The seed
    # rows also carry dim — no separate first() job for it.
    seed_rows = emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if not seed_rows:
        raise ValueError("kmeans_assign: empty input")
    dim = len(seed_rows[0][vec_col])
    centroids = {
        i: list(r[vec_col])
        for i, r in enumerate(sorted(seed_rows, key=lambda r: r[id_col]))
    }

    def assign(df: DataFrame) -> DataFrame:
        cent = spark.createDataFrame(
            [(cid, vec) for cid, vec in sorted(centroids.items())],
            f"cluster_id int, centroid array<double>",
        )
        # squared L2 via one fused zip_with/aggregate — JVM expression only
        sq = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("centroid"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = df.crossJoin(F.broadcast(cent)).select(
            id_col,
            vec_col,
            "cluster_id",
            sq.alias("sq_dist"),
        )
        # min_by struct: (distance, cluster_id) — deterministic tie-break
        return scored.groupBy(id_col).agg(
            F.min_by(
                F.struct("cluster_id", "sq_dist", vec_col),
                F.struct("sq_dist", "cluster_id"),
            ).alias("best")
        ).select(
            id_col,
            F.col("best.cluster_id").alias("cluster_id"),
            F.col("best.sq_dist").alias("sq_dist"),
            F.col(f"best.{vec_col}").alias(vec_col),
        )

    for _ in range(max_iter):
        assigned = assign(emb)
        # new centroids: explode dims, exact integer-quantized mean
        means = (
            assigned.select(
                "cluster_id", F.posexplode(vec_col).alias("pos", "v")
            )
            .groupBy("cluster_id", "pos")
            .agg(
                (
                    F.sum(F.round(F.col("v") * _Q).cast("decimal(38,0)")).cast(
                        "double"
                    )
                    / (F.count(F.lit(1)) * _Q)
                ).alias("m")
            )
            .collect()
        )
        new_centroids: dict[int, list[float]] = {}
        for r in means:
            new_centroids.setdefault(int(r["cluster_id"]), [0.0] * dim)[
                int(r["pos"])
            ] = float(r["m"])
        # empty clusters keep their previous centroid
        for cid, vec in centroids.items():
            new_centroids.setdefault(cid, vec)
        centroids = new_centroids

    return assign(emb).select(
        id_col, "cluster_id", F.round("sq_dist", 6).alias("sq_dist")
    )
