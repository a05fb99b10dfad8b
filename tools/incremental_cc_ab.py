"""A/B incremental_components against a full connected-components
recompute as history grows, writing INCREMENTAL_CC.json at the repo root.

The claim under test (operators/components.py incremental_components,
q128): merging a FIXED edge batch into persisted labels costs the
reduced-graph CC (O(batch)) plus two non-iterative passes over the label
table — so as history grows 1x -> 10x -> 30x, the incremental merge's
wall should track the (cheap, non-iterative) label passes while the full
recompute re-pays the whole O(log diameter) iterative ladder on
everything.  Equality with the full recompute is asserted on every rung
(the property test pins it on random graphs; here it holds on the
measured ones too).

Graph shape: sparse random edges over a node space 4x the edge count —
many small components, the near-dup-cluster regime (pointer jumping
converges in a handful of rounds; component sizes stay bounded as the
corpus grows, like real dedup clusters do).

Run: ``python tools/incremental_cc_ab.py`` (env
``SPARK_GRAFT_CC_SCALES`` comma-list of history multipliers, default
"1,10,30"; base history 20k edges, batch fixed at 2k edges).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.operators.components import (
    connected_components,
    incremental_components,
)
from spark_hadoop_automation_in_cloud_spark.session import get_test_session

BASE_EDGES = 20_000
BATCH_EDGES = 2_000


def edges(spark, n: int, node_space: int, salt: str):
    """n deterministic pseudo-random edges over [0, node_space)."""
    return spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(salt + ":a")), F.lit(node_space)).alias(
            "l"
        ),
        F.pmod(F.xxhash64(F.col("id"), F.lit(salt + ":b")), F.lit(node_space)).alias(
            "r"
        ),
    )


def main() -> None:
    scales = [
        int(s) for s in os.environ.get("SPARK_GRAFT_CC_SCALES", "1,10,30").split(",")
    ]
    spark = get_test_session()
    out: dict = {"base_edges": BASE_EDGES, "batch_edges": BATCH_EDGES, "runs": []}
    for scale in scales:
        n_hist = BASE_EDGES * scale
        space = 4 * (n_hist + BATCH_EDGES)
        hist = edges(spark, n_hist, space, f"h{scale}").localCheckpoint()
        batch = edges(spark, BATCH_EDGES, space, f"b{scale}").localCheckpoint()

        # the persisted state an ingest loop would already have
        labels = connected_components(hist, "l", "r")
        labels.count()

        t0 = time.time()
        inc = incremental_components(labels, batch, "l", "r")
        n_inc = inc.count()
        wall_inc = round(time.time() - t0, 3)

        t0 = time.time()
        full = connected_components(hist.unionByName(batch), "l", "r")
        n_full = full.count()
        wall_full = round(time.time() - t0, 3)

        assert n_inc == n_full
        diff = (
            inc.withColumnRenamed("component_id", "ci")
            .join(full, "node")
            .where(F.col("ci") != F.col("component_id"))
            .count()
        )
        assert diff == 0, f"incremental diverged from full CC at scale {scale}"
        out["runs"].append(
            {
                "history_scale": scale,
                "history_edges": n_hist,
                "nodes_labeled": n_full,
                "wall_incremental_s": wall_inc,
                "wall_full_recompute_s": wall_full,
                "speedup": round(wall_full / max(wall_inc, 1e-9), 2),
            }
        )
    spark.stop()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "INCREMENTAL_CC.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
