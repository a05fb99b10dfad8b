"""A/B the block-salted within-group pair join against the plain
group-key self-join, writing BLOCKED_PAIRS.json at the repo root.

The claim under test (operators/pairs.py blocked_pairs_within_groups,
q107's pair stage): a self-join keyed on cluster_id alone runs k tasks
TOTAL — at k=8 that is a quarter of this machine's cores and one task
per cluster however large clusters get — while the triangle split turns
every cluster into n_blocks*(n_blocks+1)/2 independent shuffle keys at
the cost of ~(n_blocks+1)/2x row replication.  Pair COUNTS are identical
by construction (asserted here), so any wall difference is purely the
parallelism/replication trade.

Replication multiplies every cluster's membership by the factor, so
pair work grows quadratically in the factor on BOTH variants — the
honest worst case for a pair stage (SemDeDup's real bound is the
largest cluster, which a production config caps by raising k with
corpus size).  What this harness shows is the plain variant hitting its
k-task ceiling while the salted one keeps the cores busy.

Run: ``python tools/blocked_pairs_ab.py`` (env ``SPARK_GRAFT_SF_DIR``,
``SPARK_GRAFT_PAIR_SCALES`` comma-list, default "1,3").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from spark_hadoop_automation_in_cloud_spark.functions.vectors import dot, norm
from spark_hadoop_automation_in_cloud_spark.io import read_table
from spark_hadoop_automation_in_cloud_spark.operators.clustering import kmeans_assign
from spark_hadoop_automation_in_cloud_spark.operators.pairs import (
    blocked_pairs_within_groups,
)
from spark_hadoop_automation_in_cloud_spark.session import get_test_session

THRESHOLD = 0.4


def clustered(spark, sf_dir: str, scale: int) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings", parallelize=True)
    if scale > 1:
        n = emb.count()
        emb = (
            emb.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
            .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * (n * scale))
            .drop("__rep")
        )
    e = kmeans_assign(emb, k=8, max_iter=5, keep_vec=True).select(
        "cluster_id",
        "vec_id",
        F.col("embedding").alias("__v"),
        norm(F.col("embedding")).alias("__n"),
    )
    # persist: both variants score the SAME assignment, so the k-means fit
    # is excluded from the A/B wall
    return e.persist()


def score(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        "cluster_id",
        F.col("left.vec_id").alias("left_id"),
        F.col("right.vec_id").alias("right_id"),
        F.round(
            dot(F.col("left.__v"), F.col("right.__v"))
            / (F.col("left.__n") * F.col("right.__n")),
            6,
        ).alias("cosine_sim"),
    ).where(F.col("cosine_sim") >= THRESHOLD)


def plain_pairs(e: DataFrame) -> DataFrame:
    # the pre-r6 shape: one equi-join on the cluster key
    a = e.select(
        "cluster_id",
        F.struct(F.col("vec_id"), F.col("__v"), F.col("__n")).alias("left"),
    )
    b = e.select(
        "cluster_id",
        F.struct(F.col("vec_id"), F.col("__v"), F.col("__n")).alias("right"),
    )
    return a.join(b, "cluster_id").where(
        F.col("left.vec_id") < F.col("right.vec_id")
    )


def timed_count(df: DataFrame, n: int = 2) -> tuple[float, int]:
    rows = df.count()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), rows


def community_base(spark, sf_dir: str) -> DataFrame:
    """q196's pair-stage input: LPA communities over the co-purchase
    graph joined to part-name token sets (computed ONCE per run — both
    variants and every rung replicate from this persisted base, so the
    LPA fit is excluded from the A/B wall, the kmeans-persist idiom)."""
    from spark_hadoop_automation_in_cloud_spark.operators.components import (
        label_propagation,
    )
    from spark_hadoop_automation_in_cloud_spark.queries import _copurchase_edges

    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    labels = label_propagation(_copurchase_edges(li), "p1", "p2", n_rounds=5)
    toks = F.array_distinct(F.split(F.col("p_name"), " "))
    return (
        labels.select("node", "community")
        .join(p.select(F.col("p_partkey").alias("node"), toks.alias("toks")), "node")
        .persist()
    )


def community_scaled(spark, base: DataFrame, scale: int) -> DataFrame:
    """Replicate nodes under fresh ids but the SAME community: every
    community's membership grows by the factor, so pair work grows
    quadratically on both variants and the largest community is the
    honest bound (q196's SemDeDup argument on graph buckets)."""
    if scale == 1:
        return base
    n = base.agg(F.max("node")).first()[0] + 1
    return (
        base.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("node", F.col("node") + F.col("__rep") * (n * scale))
        .drop("__rep")
    )


def community_score(pairs: DataFrame) -> DataFrame:
    inter = F.size(F.array_intersect(F.col("left.toks"), F.col("right.toks")))
    union = F.size(F.col("left.toks")) + F.size(F.col("right.toks")) - inter
    return pairs.select(
        "community",
        (inter.cast("double") / union.cast("double")).alias("jac"),
    ).where(F.col("jac") >= 0.5)


def community_plain_pairs(e: DataFrame) -> DataFrame:
    row = F.struct(F.col("node"), F.col("toks"))
    a = e.select("community", row.alias("left"))
    b = e.select("community", row.alias("right"))
    return a.join(b, "community").where(F.col("left.node") < F.col("right.node"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scales = [
        int(s) for s in os.environ.get("SPARK_GRAFT_PAIR_SCALES", "1,3").split(",")
    ]
    spark = get_test_session("blocked-pairs-ab")
    out: dict[str, dict] = {}
    for scale in scales:
        e = clustered(spark, sf_dir, scale)
        try:
            t_plain, n_plain = timed_count(score(plain_pairs(e)))
            # the q107 call shape: the 10k-row small-corpus dispatch is
            # part of the operator under test (r07 verdict item 4)
            t_blk, n_blk = timed_count(
                score(
                    blocked_pairs_within_groups(
                        e, ["cluster_id"], "vec_id", 8, auto_plain_below=10_000
                    )
                )
            )
        finally:
            e.unpersist()
        assert n_plain == n_blk, (scale, n_plain, n_blk)
        out[f"{scale}x"] = {
            "plain_sec": t_plain,
            "blocked_sec": t_blk,
            "speedup": round(t_plain / t_blk, 2),
            "pairs_over_threshold": n_plain,
        }

    # the q196 rung: community buckets instead of k-means cells (r08
    # verdict item 4 — "a BLOCKED_PAIRS-style receipt on the largest
    # community").  The blocked arm is FORCED (no dispatch) to measure
    # the salting tax on many-small-groups bucketings; the shipped q196
    # uses auto_plain_max_group=1500, which picks the plain arm at every
    # rung here (largest community 7·scale members), so plain_sec IS the
    # production path and speedup<1 is the tax the dispatch avoids.
    comm_out: dict[str, dict] = {}
    base = community_base(spark, sf_dir)
    largest = (
        base.groupBy("community").count().agg(F.max("count")).first()[0]
    )
    for scale in scales:
        e = community_scaled(spark, base, scale)
        if scale > 1:
            e = e.persist()
        try:
            t_plain, n_plain = timed_count(community_score(community_plain_pairs(e)))
            t_blk, n_blk = timed_count(
                community_score(
                    blocked_pairs_within_groups(e, ["community"], "node", 8)
                )
            )
        finally:
            if scale > 1:
                e.unpersist()
        assert n_plain == n_blk, (scale, n_plain, n_blk)
        comm_out[f"{scale}x"] = {
            "plain_sec": t_plain,
            "blocked_sec": t_blk,
            "speedup": round(t_plain / t_blk, 2),
            "pairs_over_threshold": n_plain,
            "largest_community": largest * scale,
        }
    base.unpersist()
    result = {
        "sf_dir": sf_dir,
        "n_blocks": 8,
        "threshold": THRESHOLD,
        "runs": out,
        "community_runs": comm_out,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BLOCKED_PAIRS.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
