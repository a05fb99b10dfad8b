"""Per-round wall of the incremental cluster-maintenance loop as the
maintained state grows, writing CLUSTER_MAINT.json at the repo root.

The claim under test (streaming.incremental.maintain_neardup_clusters,
q132, jobs/cluster_maintenance_job.py): each round pays its own batch —
pairs come from batch-vs-index band equi-joins, the iterative CC runs on
the reduced graph only, and the history is touched by non-iterative label
passes.  So per-round wall should stay FLAT-ish while the admitted corpus
(band index + label table) grows round over round — the same
batch-cost-tracks-the-batch contract STREAM_DEDUP.json measures for the
exact-dedup index, here for the cluster labels.

Each round ingests a fresh same-sized slice of a replicated document
corpus (replica text = near-dups of the originals, so cross-batch pairs
ARE generated every round — the merge path is exercised, not skipped).
The final state is verified against a full recompute over everything
ingested (the q132 oracle semantics, run in-engine).

Run: ``python tools/cluster_maintenance_scaling.py`` (env
``SPARK_GRAFT_SF_DIR``, ``SPARK_GRAFT_CM_ROUNDS`` default 10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.operators import dedup as dd
from spark_hadoop_automation_in_cloud_spark.operators.components import (
    neardup_clusters,
)
from spark_hadoop_automation_in_cloud_spark.session import get_test_session
from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
    maintain_neardup_clusters,
)

THRESHOLD = 0.5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("SPARK_GRAFT_CM_ROUNDS", "10"))
    spark = get_test_session("cluster-maint-scaling")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = base.count()
    # `rounds` same-sized slices: replica r gets shifted ids; replica
    # text is identical to the original's, so every round's batch
    # near-dups against earlier rounds' admitted docs (cross-batch merge
    # work every round — the path under test)
    corpus = (
        base.crossJoin(
            spark.range(rounds).withColumnRenamed("id", "__rep")
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * (n * rounds))
        .localCheckpoint()
    )

    state = tempfile.mkdtemp(prefix="cm_scaling_")
    walls = []
    try:
        for r in range(rounds):
            batch = corpus.where(F.col("__rep") == r).drop("__rep")
            t0 = time.time()
            labels = maintain_neardup_clusters(spark, batch, state, THRESHOLD)
            n_labels = labels.count()  # materialize the round
            walls.append(
                {
                    "round": r,
                    "wall_s": round(time.time() - t0, 3),
                    "labels_total": n_labels,
                }
            )

        # final-state equivalence vs one full recompute over everything
        ingested = corpus.drop("__rep")
        pairs = dd.lsh_candidate_pairs(
            dd.minhash_signatures(dd.shingle_rows(ingested, "doc_id", "text", n=2))
        ).where(F.col("est_jaccard") >= THRESHOLD)
        want = neardup_clusters(
            pairs, ingested, "doc_id",
            left_col="left_doc_id", right_col="right_doc_id",
        )
        got = spark.read.parquet(os.path.join(state, "labels"))
        diff = (
            got.withColumnRenamed("cluster_id", "got_c")
            .join(want, got["node"] == want["doc_id"])
            .where(F.col("got_c") != F.col("cluster_id"))
            .count()
        )
        assert diff == 0 and got.count() == want.count(), (
            "maintained labels diverged from the full recompute"
        )
    finally:
        shutil.rmtree(state, ignore_errors=True)

    mid = len(walls) // 2
    early = sorted(w["wall_s"] for w in walls[1 : mid + 1])[len(walls[1 : mid + 1]) // 2]
    late = sorted(w["wall_s"] for w in walls[mid:])[len(walls[mid:]) // 2]
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "batch_docs": n,
        "threshold": THRESHOLD,
        "walls": walls,
        "late_over_early": round(late / max(early, 1e-9), 2),
        "final_equals_full_recompute": True,
    }
    spark.stop()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CLUSTER_MAINT.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
