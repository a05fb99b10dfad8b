"""Connected components over a pair list — the canonical last step of
large-scale dedup: near-dup PAIRS (from MinHash LSH / embedding cosine)
become dedup CLUSTERS, each keyed by its minimum member id.

No Spark built-in exists (GraphX is Scala-only, graphframes is an external
package), so this is a hand-rolled label-propagation loop — the one place
the engine runs driver-side iteration, and deliberately so: each round is
a pure DataFrame join+aggregate (fully distributed); the driver only
decides "are we done".  Each round combines one hop of neighbor-min
propagation with a pointer-jumping shortcut (label := label's label, the
same doubling trick as Hash-to-Min / large-star contraction), so rounds
needed = O(log diameter) — a 1M-hop boilerplate chain converges in ~20
rounds, and at 100 TB that is a bounded handful of shuffles, each
AQE-sized.  Lineage is cut every round with ``localCheckpoint`` so the
plan doesn't grow with iterations.  If the round budget is ever exhausted
the operator RAISES rather than returning silently-wrong labels.

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

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_rounds`` — with pointer jumping that needs a component diameter
    over ~2^max_rounds, so a raise means something is structurally wrong
    (e.g. an unbounded pair generator), never a case to paper over with
    wrong cluster ids.
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

    changed = 1
    for _ in range(max_rounds):
        # candidate label per node: min over (own label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels, edges.b == labels.node)
            .select(F.col("a").alias("node"), "component_id")
        )
        propagated = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component_id").alias("component_id"))
        )
        # pointer jump: component_id is itself a labeled node, so replace
        # each label by that node's (never larger) label — chain depth
        # halves per round, giving O(log diameter) convergence where pure
        # propagation is O(diameter)
        parent = propagated.select(
            F.col("node").alias("__lbl"), F.col("component_id").alias("__lbl_comp")
        )
        new_labels = (
            propagated.join(parent, propagated.component_id == parent.__lbl)
            .select("node", F.col("__lbl_comp").alias("component_id"))
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
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "labels would be wrong — raise max_rounds or check the pair "
            "generator for unbounded chains"
        )
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


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    per_iter_round_dp: int | None = None,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Same driver-role contract as :func:`connected_components`: every round
    is one distributed join+aggregate (rank mass flows src→dst divided by
    out-degree), the driver only counts rounds.  Dangling nodes (no
    out-edges) donate their mass uniformly each round via a 1-row
    aggregate broadcast-crossed back in — no collect, no driver math.
    Lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
    rounds so the plan stays flat across iterations; 2 is the measured
    sweet spot on this workload (each checkpoint materializes a |nodes|-row
    frame and schedules a job — every round pays that fixed cost twice as
    often for no lineage benefit, while 5+ lets the chained-round plan grow
    enough that analysis/AQE overhead dominates).  The final round always
    checkpoints.  Results are invariant to the cadence: the per-round
    rounding (below) happens inside the plan either way.

    Fixed ``n_iter`` (not convergence-tested): PageRank mass moves <1%
    after ~10 damped rounds on social-shaped graphs, and a deterministic
    round count is what makes two runs comparable.  Output:
    node, rank (rounded 6dp; Σ rank = 1).

    ``per_iter_round_dp``: round each iteration's ranks to this many
    decimal places.  The per-round float summation ORDER differs between
    engines (Spark sums inflow in partition order, a sequential engine in
    scan order) — last-ulp differences that 10 damped rounds then amplify.
    Snapping every iteration re-synchronizes the trajectories: with
    identical scalar arithmetic on both sides (see q69's oracle), the only
    per-round noise is the inflow sum's ~1e-18 absolute wobble, so a 9dp
    grid makes a cross-engine snap disagreement ~1e-9-per-node-round
    unlikely — not a guarantee, but negligible against the oracle's 6dp
    output rounding.  The perturbation itself (<5e-10/round) sits far
    below PageRank's meaningful resolution.  ``None`` keeps raw doubles.

    Correctness is additionally pinned by a pytest fixture vs an
    independent dense power iteration (tests/test_operators.py).
    """
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every} "
            "(pass n_iter to checkpoint only the final round)"
        )
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint()  # edge construction may be expensive; it feeds 3 setup frames
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # one scalar the driver legitimately needs
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # hoist the per-round rank⋈degree join out of the loop: a weighted edge
    # table carries each edge's out-degree, so one join per round (ranks⋈w
    # on src) replaces the two-join chain; arithmetic stays rank/deg, so
    # results are bit-identical to the unhoisted form
    w = e.join(out_deg, "src").select("src", "dst", "deg").localCheckpoint()
    dangling_nodes = nodes.join(
        out_deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint()
    # one-time scalar: a graph with no dangling nodes (e.g. any symmetric
    # graph) skips the per-round dangling-mass job entirely; adding the
    # exact-zero dm/n term was a no-op in IEEE arithmetic anyway
    has_dangling = bool(dangling_nodes.head(1))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))

    for i in range(n_iter):
        contribs = (
            ranks.join(w, ranks.node == w.src)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        inflow = F.coalesce(F.col("inflow"), F.lit(0.0))
        nxt = nodes.join(contribs, "node", "left")
        if has_dangling:
            dangling = (
                ranks.join(dangling_nodes, "node")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            nxt = nxt.crossJoin(F.broadcast(dangling))
            new_rank = F.lit((1.0 - damping) / n) + damping * (
                inflow + F.col("dm") / n
            )
        else:
            new_rank = F.lit((1.0 - damping) / n) + damping * inflow
        if per_iter_round_dp is not None:
            new_rank = F.round(new_rank, per_iter_round_dp)
        ranks = nxt.select("node", new_rank.alias("rank"))
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", F.round("rank", 6).alias("rank"))
