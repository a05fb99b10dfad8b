"""Connected components over a pair list — the canonical last step of
large-scale dedup: near-dup PAIRS (from MinHash LSH / embedding cosine)
become dedup CLUSTERS, each keyed by its minimum member id.

No Spark built-in exists (GraphX is Scala-only, graphframes is an external
package), so this is a hand-rolled label-propagation loop — the one place
the engine runs driver-side iteration, and deliberately so: each round is
a pure DataFrame join+aggregate (fully distributed); the driver only
decides "are we done".  Rounds needed = graph diameter ≤ O(log n) for the
short, clumpy chains dedup produces — at 100 TB that is a handful of
shuffles, each AQE-sized.  Lineage is cut every round with
``localCheckpoint`` so the plan doesn't grow with iterations.

Determinism: the final label of every node is exactly
min(id over its component) — independent of iteration order, partitioning,
or round count, which is what makes the result oracle-checkable (DuckDB
recursive-CTE transitive closure + MIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    max_rounds: int = 25,
) -> DataFrame:
    """Pairs (undirected edges) → (node, component_id = min node id reachable).

    Only nodes appearing in ``pairs`` are labeled; callers wanting
    singletons join the result back to the full id universe with a
    coalesce-to-self.

    Output: node, component_id.
    """
    edges = (
        pairs.select(F.col(left_col).alias("a"), F.col(right_col).alias("b"))
        .unionByName(
            pairs.select(F.col(right_col).alias("a"), F.col(left_col).alias("b"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("component_id")
    ).localCheckpoint()

    for _ in range(max_rounds):
        # candidate label per node: min over (own label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels, edges.b == labels.node)
            .select(F.col("a").alias("node"), "component_id")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component_id").alias("component_id"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component_id") != F.col("o.component_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def neardup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Full dedup-cluster assignment: every id in ``all_ids`` labeled with
    its near-dup component (itself when it has no near-duplicates).

    Output: ``id_col``, cluster_id.
    """
    comp = connected_components(pairs, left_col, right_col)
    return (
        all_ids.select(F.col(id_col))
        .join(comp, all_ids[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
