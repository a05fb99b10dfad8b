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


def _persistent_rdd_ids(spark) -> set[int]:
    """Ids of ALL currently persisted RDDs in the session — observability
    only (the leak regression test counts these); per-call cleanup uses
    the ownership-scoped :func:`_pinned_rdd_ids` instead.  Best-effort:
    empty under Spark Connect."""
    try:
        return {
            int(i)
            for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        }
    except Exception:
        return set()


def _pinned_rdd_ids(df: DataFrame) -> set[int]:
    """Ids of the block-pinned RDDs reachable from ``df``'s physical RDD —
    for a localCheckpoint'd frame, exactly the checkpoint block this frame
    owns (the physical RDD is a thin wrapper; the storage-levelled
    ancestor sits 1-2 dependency hops below it).  Walking the frame's OWN
    dependency graph — instead of diffing the session-global persistent-
    RDD table — means a concurrent caller's checkpoints can never be
    attributed to this one and torn down mid-flight.  Best-effort:
    returns empty under Spark Connect, where the JVM-side RDD graph is
    not reachable — cleanup then simply doesn't happen."""
    out: set[int] = set()
    try:
        def walk(r) -> None:
            lvl = r.getStorageLevel()
            if lvl.useMemory() or lvl.useDisk():
                out.add(int(r.id()))
            deps = r.dependencies()
            for i in range(deps.size()):
                walk(deps.apply(i).rdd())

        walk(df._jdf.queryExecution().toRdd())
    except Exception:
        return set()
    return out


def _unpersist_rdds(spark, ids: set[int]) -> None:
    """Drop the storage of the given persisted RDD ids (non-blocking).

    Iterative operators cut lineage with ``localCheckpoint``, which PINS
    each checkpointed frame in block storage with no DataFrame-level
    handle to release it.  Left alone, every call leaks its intermediate
    checkpoints (the edge frame alone is O(|edges|) memory), and repeated
    calls degrade the whole JVM — measured on the 17.9M-edge PageRank
    input: run-to-run wall oscillated 11s→52s as dead blocks forced
    eviction and GC.  Callers record each checkpoint's own pinned ids via
    ``_pinned_rdd_ids`` and release that exact set minus the returned
    frame's (a localCheckpoint'd RDD must never be unpersisted while
    still referenced — its lineage is truncated, so lost blocks are
    unrecoverable)."""
    try:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for i in ids:
            r = m.get(i)
            if r is not None:
                r.unpersist(False)
    except Exception:
        pass


def connected_components(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    max_rounds: int = 25,
    broadcast_nodes_max: int = 1_000_000,
    broadcast_min_edge_rows: int = 1_000_000,
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

    Join strategy of the per-round edges⋈labels hop follows
    :func:`label_propagation`'s dispatch (its docstring has the measured
    two-way A/B): on a large edge list with a bounded node set, the
    |V|-row label frame broadcasts so the checkpointed edges are never
    exchanged per round (LogicalRDD frames have no Catalyst statistics,
    so the planner would sort-merge every round).  Only the edge join is
    dispatched: the pointer-jump self-join's two sides share one
    subtree, which sort-merge deduplicates via ReusedExchange but a
    broadcast build would compute twice.  Bit-identical results either
    way (integer MIN labels — order-free).
    """
    spark = pairs.sparkSession
    created: set[int] = set()
    # any failure (a raise below, or a Spark action dying mid-round)
    # must not strand this call's localCheckpoint blocks — the
    # r11 review finding: the error path leaked `created` (the same
    # degradation _unpersist_rdds documents for the success path)
    try:
        edges = (
            pairs.select(F.col(left_col).alias("a"), F.col(right_col).alias("b"))
            .unionByName(
                pairs.select(F.col(right_col).alias("a"), F.col(left_col).alias("b"))
            )
            .distinct()
            .localCheckpoint()
        )
        created |= _pinned_rdd_ids(edges)
        labels = edges.select(F.col("a").alias("node")).distinct().select(
            "node", F.col("node").alias("component_id")
        ).localCheckpoint()
        created |= _pinned_rdd_ids(labels)
        # join-strategy dispatch (docstring); the edge gate
        # short-circuits so small graphs pay no label-count job
        bc = (
            F.broadcast
            if (
                edges.count() >= broadcast_min_edge_rows
                and labels.count() <= broadcast_nodes_max
            )
            else (lambda df: df)
        )

        # Convergence probe (r11): each round takes per-node MIN over (own
        # label, neighbor labels) and then a pointer jump to a label that
        # is itself never larger (labels start as node ids and only ever
        # decrease, so label(label) <= label) — the per-node label is
        # MONOTONE NON-INCREASING round over round.  Hence "no node
        # changed" ⇔ the EXACT label sum is unchanged (strict decrease in
        # any node strictly decreases the sum; DECIMAL(38,0) keeps it
        # exact for any bigint id set).  The probe is one scan-aggregate
        # of the just-checkpointed |V|-row frame, replacing the old
        # new⋈old join (two exchanges + sort per round) that existed only
        # to answer this yes/no.
        def _label_sum(frame: DataFrame):
            return frame.agg(
                F.sum(F.col("component_id").cast("decimal(38,0)")).alias("s")
            ).first()["s"]

        prev_sum = _label_sum(labels)
        changed = 1
        for _ in range(max_rounds):
            # candidate label per node: min over (own label, neighbors' labels)
            lab_r = bc(labels)
            neighbor_labels = (
                edges.join(lab_r, edges.b == lab_r.node)
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
            created |= _pinned_rdd_ids(new_labels)
            new_sum = _label_sum(new_labels)
            changed = 0 if new_sum == prev_sum else 1
            prev_sum = new_sum
            labels = new_labels
            if changed == 0:
                break
        if changed != 0:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds; "
                "labels would be wrong — raise max_rounds or check the pair "
                "generator for unbounded chains"
            )
        # re-checkpoint the result, then release the edge frame and every
        # per-round label snapshot THIS call pinned (its own ids, never a
        # concurrent caller's) — see _unpersist_rdds
        out = labels.localCheckpoint()
        _unpersist_rdds(spark, created - _pinned_rdd_ids(out))
        return out
    except BaseException:
        _unpersist_rdds(spark, created)
        raise


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
    broadcast_nodes_max: int = 1_000_000,
    assume_distinct_edges: bool = False,
    small_checkpoint_every: int = 2,
    chain_max_edge_rows: int = 4_000_000,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    ``assume_distinct_edges``: a duplicated edge would double-count its
    rank contribution, so the input is distinct-ed defensively — a full
    shuffle of the edge list.  Callers that construct edges with their own
    ``.distinct()`` (the common case: any derived co-occurrence graph)
    pass True to skip that redundant shuffle; the setup then only scans
    the input once to checkpoint it.  Correctness is entirely the
    caller's promise — there is no cheap way to verify it.

    Same driver-role contract as :func:`connected_components`: every round
    is one distributed join+aggregate (rank mass flows src→dst divided by
    out-degree), the driver only counts rounds.  The rank state carries
    each node's out-degree (``nd`` below), so the loop joins ranks
    straight to the RAW edge list — no per-round rank⋈degree chain — and
    dangling mass (nodes with no out-edges) is a filter-scan of the rank
    state itself, not a join: one 1-row aggregate broadcast-crossed back
    in, no collect, no driver math.

    Join strategy is picked ONCE from ``n = |nodes|`` (a scalar the driver
    already needs for the 1/n terms):

    - ``n <= broadcast_nodes_max`` — the rank frame is broadcast into the
      edge join.  The big side (edges) is then never exchanged or sorted:
      each round is one map-side hash join over the checkpointed edge
      partitions + a map-side-combined aggregate whose exchange carries
      at most |nodes| rows per task.  Profiled on the q69 co-purchase
      graph at sf0.1 (1.8M edges) and its 10x replication (17.9M edges):
      2.0-2.2x faster end-to-end than the sort-merge form at BOTH scales
      (7.4s→3.4s, 29.8s→17.0s), with per-round cost dropping ~2.5s→
      ~0.8s at 10x — the remaining 10x wall is the one-time linear setup
      (edge distinct + degree build), i.e. work proportional to data, not
      per-round overhead.  On a dangling-free graph whose edge list is
      small enough (``chain_max_edge_rows``, read for free from the setup
      aggregate's degree sum), the per-round rank frame is referenced
      exactly ONCE by the next round's plan (inside the contribs
      broadcast), so rounds chain LAZILY and the path checkpoints every
      ``small_checkpoint_every`` rounds (r11): K rounds cost
      ~K/small_checkpoint_every driver actions and measurably fewer
      scheduler jobs (53 → 48 jobs for q69's 10 rounds at 2), with
      bit-identical output (same plan tree, materialized less often; the
      per-round dp snap already pins summation order).  The chain gate
      exists because the win is a LATENCY effect: on the 1.8M-edge q69
      graph cadence 2 measured 6.25 s vs 6.96 s every-round (4-trial
      interleaved medians; cadence 5 = 6.86 s and a full 10-round unroll
      regressed to 9.9 s — AQE re-planning grows with plan depth), but
      on its 17.9M-edge 10x replication chaining REGRESSED 7.4/10.0 s →
      9.8/12/31 s (erratic — the two e-joins per action compete for
      execution memory within one job), so large edge lists keep the
      every-round cut;
      a graph WITH dangling mass keeps the every-round checkpoint — its
      dangling aggregate is a second reference to the rank frame, and an
      unmaterialized chain would re-execute each round's subtree per
      reference (2^rounds growth).
    - larger graphs — sort-merge join with ``checkpoint_every`` lineage
      cuts; 2 is the measured sweet spot (each checkpoint materializes a
      |nodes|-row frame and schedules a job — every round pays that fixed
      cost twice as often for no lineage benefit, while 5+ lets the
      chained-round plan grow enough that analysis/AQE overhead
      dominates).  The final round always checkpoints.

    Both paths run the IDENTICAL scalar arithmetic in the identical
    order (rank/deg contributions, damped sum, optional per-round
    rounding), so results are bit-equal regardless of which is taken —
    pinned by tests/test_operators.py running the dense-power-iteration
    fixture against both.

    Local wall floor (measured 2026-08-14, q69 graph, 1.8M edges, 32
    cores): fully UNROLLING all 10 rounds into one lazy plan (no
    checkpoints, single action) is bit-identical and saved <20%
    (3.5-4.4s vs ~4.5s loop); a join-free prototype that inlined the
    rank state as a foldable ``from_json`` array literal (the bloom
    idiom — no broadcast exchange, no checkpoint, one aggregate job +
    a ≤|nodes|-row collect per round) still cost 0.28-0.33s/round vs
    the broadcast form's ~0.35s.  So the per-round floor is the JOB
    itself — task scheduling plus the full edge-partition scan feeding
    the aggregate — with the BroadcastExchange contributing only
    ~0.06s; power iteration's data dependence makes those rounds
    inherently sequential.  The literal-map form was rejected on that
    measurement: ~0.7s total saving, a 2.3s one-time node-index pass,
    driver-resident rank state (unbounded in |nodes|, unlike k-means'
    k·dim model), and a measured 1-ulp 6dp divergence on one node.  On
    a real cluster the per-round term is the edge scan+join, which the
    shipped forms already minimize, so the loop (simpler, resumable,
    bounded plans) stays.

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
    """
    if checkpoint_every < 1 or small_checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}/"
            f"{small_checkpoint_every} "
            "(pass n_iter to checkpoint only the final round)"
        )
    spark = edges.sparkSession
    created: set[int] = set()
    # any failure (a raise below, or a Spark action dying mid-round)
    # must not strand this call's localCheckpoint blocks — the
    # r11 review finding: the error path leaked `created` (the same
    # degradation _unpersist_rdds documents for the success path)
    try:
        e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        if not assume_distinct_edges:
            e = e.distinct()
        # edge construction may be expensive; it feeds 2 setup frames + the loop
        e = e.localCheckpoint()
        created |= _pinned_rdd_ids(e)
        # node state: (node, deg) — deg NULL marks a dangling node.  Carrying
        # deg inside the rank frame removes both per-round joins the old shape
        # paid (rank⋈degree for contributions, rank⋈dangling for the mass).
        # Built in ONE map-side-combined aggregation over the edge endpoints
        # (src endpoints count toward degree, dst endpoints only assert node
        # existence) — the previous distinct-union ⋈ degree-aggregate shape
        # paid two exchanges and a join for the identical (node, deg) rows.
        nd = (
            e.select(F.col("src").alias("node"), F.lit(1).alias("__is_src"))
            .unionByName(e.select(F.col("dst").alias("node"), F.lit(0).alias("__is_src")))
            .groupBy("node")
            .agg(F.sum("__is_src").alias("__deg_raw"))
            .select(
                "node",
                F.when(F.col("__deg_raw") > 0, F.col("__deg_raw")).alias("deg"),
            )
            .localCheckpoint()
        )
        created |= _pinned_rdd_ids(nd)
        # BOTH one-time setup scalars (node count for the 1/n terms; the
        # dangling flag that skips the per-round dangling-mass job on
        # symmetric graphs — adding the exact-zero dm/n term was a no-op
        # in IEEE arithmetic anyway) ride ONE aggregate over the
        # checkpointed node state instead of a count job + a filter-scan
        # job (r10: one fewer setup action per call, same values)
        setup = nd.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("deg").isNull(), 1).otherwise(0)).alias("hd"),
            # total out-degree == |E| — free here, feeds the chain gate
            F.coalesce(F.sum("deg"), F.lit(0)).alias("te"),
        ).first()
        n = int(setup["n"])
        has_dangling = bool(setup["hd"])
        total_edges = int(setup["te"])
        small = n <= broadcast_nodes_max
        ranks = nd.select("node", "deg", F.lit(1.0 / n).alias("rank"))
        if small:
            ranks = ranks.localCheckpoint()
            created |= _pinned_rdd_ids(ranks)

        # lineage-cut cadence (docstring): broadcast path chains rounds
        # lazily iff the dangling aggregate adds no second reference to
        # the per-round rank frame AND the edge list is small enough that
        # per-round latency (not compute) is the wall
        cut_every = (
            (
                small_checkpoint_every
                if not has_dangling and total_edges <= chain_max_edge_rows
                else 1
            )
            if small
            else checkpoint_every
        )
        for i in range(n_iter):
            r = F.broadcast(ranks) if small else ranks
            contribs = (
                r.join(e, r.node == e.src)
                .select(F.col("dst").alias("node"), (r.rank / r.deg).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
            inflow = F.coalesce(F.col("inflow"), F.lit(0.0))
            # contribs is at most |nodes| rows post-aggregate — on the small
            # path broadcast it too, so the rank update never exchanges nd
            nxt = nd.join(F.broadcast(contribs) if small else contribs, "node", "left")
            if has_dangling:
                dangling = (
                    ranks.where(F.col("deg").isNull())
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
            ranks = nxt.select("node", "deg", new_rank.alias("rank"))
            if (i + 1) % cut_every == 0 or i == n_iter - 1:
                ranks = ranks.localCheckpoint()
                created |= _pinned_rdd_ids(ranks)
        # materialize the returned frame into its OWN checkpoint, then release
        # every intermediate one THIS call pinned (edge frame, node state, the
        # per-round rank snapshots — its own ids, never a concurrent
        # caller's) — see _unpersist_rdds
        out = ranks.select("node", F.round("rank", 6).alias("rank")).localCheckpoint()
        _unpersist_rdds(spark, created - _pinned_rdd_ids(out))
        return out
    except BaseException:
        _unpersist_rdds(spark, created)
        raise


def incremental_components(
    labels: DataFrame,
    new_pairs: DataFrame,
    left_col: str,
    right_col: str,
    node_col: str = "node",
    comp_col: str = "component_id",
    max_rounds: int = 25,
) -> DataFrame:
    """Merge a NEW batch of edges into persisted component labels without
    re-running the iterative loop over the historical graph.

    ``labels`` is a :func:`connected_components`-contract table (one row
    per historical node, ``comp_col`` = min member id — so every root is
    itself a labeled node mapping to itself); ``new_pairs`` is the edge
    batch, touching old nodes, new nodes, or both.  Output: the updated
    full label table, row-identical to ``connected_components`` over the
    union graph restricted to (historical ∪ batch) nodes — pinned by the
    any-split equivalence property test.

    Why this shape at 100 TB: full CC over the history is O(log diameter)
    shuffles of EVERYTHING per ingest.  Here the iterative work runs on
    the REDUCED graph only — each batch endpoint replaced by its old
    root, so its size is O(batch), independent of history — and the
    history is touched by exactly two non-iterative joins, both keyed on
    columns a bucketed label store co-locates:

      1. endpoint lookup (batch ⋈ labels on node) — batch-sized output;
      2. root remap (labels ⋈ broadcast(reduced labels) on comp) — one
         streaming pass over the label table against a broadcast map,
         no history shuffle at all.

    Min-id labels make the algebra close: the merged component's minimum
    is the minimum over its old roots (each already the min of its old
    members) and its genuinely-new node ids — exactly the node set of
    the reduced graph, so the reduced CC's min-id labels ARE the final
    labels.  A non-min representative scheme would break this (the
    docstring contract above is load-bearing, not convention).

    NULL endpoints are dropped (an equi-join on the node key would never
    match them; same stance as bloom/dedup).
    """
    a, b = F.col(left_col), F.col(right_col)
    e = new_pairs.where(a.isNotNull() & b.isNotNull()).select(
        a.alias("__a"), b.alias("__b")
    )
    la = labels.select(F.col(node_col).alias("__a"), F.col(comp_col).alias("__ra"))
    lb = labels.select(F.col(node_col).alias("__b"), F.col(comp_col).alias("__rb"))
    spark = new_pairs.sparkSession
    # batch-sized; checkpointed EAGERLY so the endpoint-lookup joins (the
    # history pass) run exactly once, feeding both the reduced CC and the
    # new-node pick — then released below once its two consumers have
    # their own checkpoints (the usual localCheckpoint ownership dance,
    # see _unpersist_rdds)
    mapped = (
        e.join(la, "__a", "left")
        .join(lb, "__b", "left")
        .select(
            F.coalesce("__ra", "__a").alias("ma"),
            F.col("__ra").isNull().alias("__a_new"),
            F.coalesce("__rb", "__b").alias("mb"),
            F.col("__rb").isNull().alias("__b_new"),
        )
        .localCheckpoint()
    )
    pinned = _pinned_rdd_ids(mapped)
    reduced = connected_components(mapped, "ma", "mb", max_rounds)
    pinned |= _pinned_rdd_ids(reduced)
    new_ids = (
        mapped.select(F.col("ma").alias("__nid")).where(F.col("__a_new"))
        .unionByName(
            mapped.select(F.col("mb").alias("__nid")).where(F.col("__b_new"))
        )
        .distinct()
    )
    # ONE batch-sized result checkpoint (the convention every iterative
    # operator here follows: the returned lineage pins exactly one
    # block): reduced labels annotated with the is-new flag.  The EAGER
    # checkpoint materializes it, after which mapped's and reduced's own
    # blocks are released — a per-batch ingest loop accumulates one
    # O(batch) block per call instead of three (the accumulation
    # pathology _unpersist_rdds' docstring measures).
    ann = (
        reduced.join(
            F.broadcast(new_ids), reduced.node == F.col("__nid"), "left"
        )
        .select(
            "node", "component_id", F.col("__nid").isNotNull().alias("__is_new")
        )
        .localCheckpoint()
    )
    _unpersist_rdds(spark, pinned - _pinned_rdd_ids(ann))
    remap = ann.select(
        F.col("node").alias("__root"), F.col("component_id").alias("__new_comp")
    )
    updated = (
        labels.join(
            F.broadcast(remap), labels[comp_col] == F.col("__root"), "left"
        )
        .select(
            labels[node_col].alias(node_col),
            F.coalesce(F.col("__new_comp"), labels[comp_col]).alias(comp_col),
        )
    )
    new_nodes = ann.where(F.col("__is_new")).select(
        F.col("node").alias(node_col), F.col("component_id").alias(comp_col)
    )
    return updated.unionByName(new_nodes)


def triangle_count(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    topk: int = 50,
) -> DataFrame:
    """Per-node triangle participation over an undirected graph, top-k —
    the local clustering signal (community cores, link-spam hubs, dense
    near-dup cliques) that :func:`connected_components` is blind to: a
    component says "these touch", triangles say "these touch EACH
    OTHER".

    Algorithm: degree-ordered edge orientation (Schank / MPC triangle
    enumeration).  Every undirected edge is oriented from its lower end
    to its higher end under the total order ``(degree, node)``; a
    triangle ``{a,b,c}`` then materializes exactly once, as the wedge
    ``a→b, a→c`` (b below c in the same order) closed by the edge
    ``b→c``.  No per-node adjacency list is ever built and nothing is
    corpus-quadratic.

    WHY the orientation is the 100 TB story: naive wedge counting
    generates ``Σ deg(v)²`` candidates — a single celebrity hub with
    degree 10M yields 10¹⁴ wedges on its own.  Ordering by degree caps
    every node's OUT-degree at O(√m) (each higher-ordered neighbor has
    degree ≥ yours, and only √(2m) nodes can have degree ≥ √(2m)), so
    the wedge volume is ≤ Σ outdeg² = O(m^1.5) — the enumeration
    optimum — and the hub's wedges are charged to its low-degree
    neighbors, which parallelize.  The plan is two shuffles (wedge
    build keyed on the pivot, closure join keyed on the wedge ends);
    residual same-key skew is AQE's to split.

    Input may contain duplicates and either orientation; self-loops
    drop.  Output: node (as ``src_col``'s name), tri_count (bigint),
    top-k by (tri_count DESC, node ASC) — deterministic total order.
    """
    per_node, _ = _node_triangles_and_degrees(edges, src_col, dst_col)
    return (
        per_node.select(F.col("node").alias(src_col), "tri_count")
        .orderBy(F.col("tri_count").desc(), F.col(src_col).asc())
        .limit(topk)
    )


def _node_triangles_and_degrees(
    edges: DataFrame, src_col: str, dst_col: str
) -> tuple[DataFrame, DataFrame]:
    """The shared enumeration core of :func:`triangle_count` and
    :func:`clustering_coefficient`: (per-node triangle counts, per-node
    degrees) over the normalized undirected graph."""
    u, v = F.col(src_col), F.col(dst_col)
    e = (
        edges.where(u != v)
        .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da, db = F.col("__da"), F.col("__db")
    ordered = e.join(
        deg.select(F.col("node").alias("u"), F.col("d").alias("__da")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("d").alias("__db")), "v")
    u_first = (da < db) | ((da == db) & (F.col("u") < F.col("v")))
    o = ordered.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, db).otherwise(da).alias("bd"),
    )
    o1 = o.select(F.col("a"), F.col("b").alias("x"), F.col("bd").alias("xd"))
    o2 = o.select(F.col("a"), F.col("b").alias("y"), F.col("bd").alias("yd"))
    wedges = o1.join(o2, "a").where(
        (F.col("xd") < F.col("yd"))
        | ((F.col("xd") == F.col("yd")) & (F.col("x") < F.col("y")))
    )
    tri = wedges.join(
        o.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"]
    ).select("a", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tri_count"))
    )
    return per_node, deg


def clustering_coefficient(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    topk: int = 50,
    min_degree: int = 2,
) -> DataFrame:
    """Local clustering coefficient, top-k: ``2·triangles(v) /
    (d(v)·(d(v)−1))`` — how close each node's neighborhood is to a
    clique, the community-core metric that normalizes q161's raw
    triangle counts by opportunity (a degree-100 node in 10 triangles
    is loose; a degree-5 node in 10 is a clique).

    Same enumeration core as :func:`triangle_count` (degree-oriented,
    O(m^1.5) wedges — TRIANGLES.json has the A/B); the coefficient adds
    one left join back to the degree table (nodes in no triangle score
    0, not absent) and one row-local division of exact bigints.  Nodes
    below ``min_degree`` drop (coefficient undefined).  Deterministic
    order: (coefficient DESC, degree DESC, node ASC).

    Output: node (as ``src_col``), degree, tri_count (bigint),
    clustering_coef (double 6dp).
    """
    per_node, deg = _node_triangles_and_degrees(edges, src_col, dst_col)
    joined = deg.where(F.col("d") >= min_degree).join(per_node, "node", "left")
    tri = F.coalesce(F.col("tri_count"), F.lit(0)).cast("bigint")
    coef = F.round(
        (2.0 * tri.cast("double"))
        / (F.col("d").cast("double") * (F.col("d").cast("double") - 1.0)),
        6,
    )
    return (
        joined.select(
            F.col("node").alias(src_col),
            F.col("d").cast("bigint").alias("degree"),
            tri.alias("tri_count"),
            (coef + F.lit(0.0)).alias("clustering_coef"),
        )
        .orderBy(
            F.col("clustering_coef").desc(),
            F.col("degree").desc(),
            F.col(src_col).asc(),
        )
        .limit(topk)
    )


def _sql_triangle_core_ctes(edges_sql: str, src_col: str, dst_col: str) -> str:
    """The shared CTE chain of :func:`sql_triangle_count` and
    :func:`sql_clustering_coefficient` (normalize → degrees → orient →
    wedges → close → per-node counts) — ONE definition of the Schank
    orientation and its (degree, node) tie-break, mirroring how the
    kernels share :func:`_node_triangles_and_degrees` (and how bpe.py's
    oracles share ``_sql_training_ctes``)."""
    return f"""
e AS (
  SELECT DISTINCT least({src_col}, {dst_col}) AS u,
                  greatest({src_col}, {dst_col}) AS v
  FROM ({edges_sql}) WHERE {src_col} <> {dst_col}
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node
),
o AS (
  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS a,
         CASE WHEN da.d < db.d OR (da.d = db.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS b,
         CASE WHEN da.d < db.d OR (da.d = db.d AND e.u < e.v)
              THEN db.d ELSE da.d END AS bd
  FROM e JOIN deg da ON da.node = e.u JOIN deg db ON db.node = e.v
),
wedges AS (
  SELECT o1.a, o1.b AS x, o2.b AS y
  FROM o o1 JOIN o o2 ON o1.a = o2.a
  WHERE o1.bd < o2.bd OR (o1.bd = o2.bd AND o1.b < o2.b)
),
tri AS (
  SELECT w.a, w.x, w.y FROM wedges w JOIN o ON o.a = w.x AND o.b = w.y
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_count
  FROM (SELECT a AS node FROM tri UNION ALL SELECT x FROM tri
        UNION ALL SELECT y FROM tri)
  GROUP BY node
)"""


def sql_clustering_coefficient(
    edges_sql: str,
    src_col: str,
    dst_col: str,
    topk: int = 50,
    min_degree: int = 2,
) -> str:
    """DuckDB twin of :func:`clustering_coefficient`: the shared
    :func:`_sql_triangle_core_ctes` chain plus the degree left-join and
    the identical division/order."""
    return f"""
WITH {_sql_triangle_core_ctes(edges_sql, src_col, dst_col)}
SELECT d.node AS {src_col},
       CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(p.tri_count, 0) AS BIGINT) AS tri_count,
       round(2.0 * CAST(COALESCE(p.tri_count, 0) AS DOUBLE)
             / (CAST(d.d AS DOUBLE) * (CAST(d.d AS DOUBLE) - 1.0)), 6) + 0.0
         AS clustering_coef
FROM deg d LEFT JOIN per_node p ON p.node = d.node
WHERE d.d >= {min_degree}
ORDER BY clustering_coef DESC, degree DESC, {src_col} ASC
LIMIT {topk}
"""


def sql_triangle_count(edges_sql: str, src_col: str, dst_col: str, topk: int = 50) -> str:
    """DuckDB twin of :func:`triangle_count`: identical normalization,
    ``(degree, node)`` orientation spelled as the same explicit boolean
    (no row-value comparison, so the two engines share one tie-break
    definition), one wedge join, one closure join, same top-k order —
    all via the shared :func:`_sql_triangle_core_ctes` fragment."""
    return f"""
WITH {_sql_triangle_core_ctes(edges_sql, src_col, dst_col)}
SELECT node AS {src_col}, tri_count FROM per_node
ORDER BY tri_count DESC, {src_col} ASC LIMIT {topk}
"""


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    n_iter: int = 10,
    damping: float = 0.85,
    per_iter_round_dp: int | None = 9,
    assume_distinct_edges: bool = False,
    small_checkpoint_every: int = 2,
    chain_max_edge_rows: int = 4_000_000,
) -> DataFrame:
    """Personalized PageRank: power iteration whose teleport lands on a
    SEED SET instead of uniformly — the "related to THIS cohort /
    item" primitive (recommendation candidates, local community
    discovery) that global PageRank (:func:`pagerank`, q69) cannot
    express: its scores answer "important overall", these answer
    "important FROM HERE".

    ``rank' = (1−d)·1[v∈S]/|S| + d·(inflow + dangling_mass·1[v∈S]/|S|)``
    — dangling mass teleports back to the seeds (the standard PPR
    convention), computed as a filter-aggregate of the rank state and
    broadcast-crossed back: no collect, no driver math (q69's
    discipline).  Like :func:`pagerank`, a one-time setup scalar
    (``has_dangling``) skips that per-round 1-row job entirely on
    graphs with no dangling nodes — any symmetric graph, e.g. q185's
    contact graph — where the term is exactly 0.0 in IEEE arithmetic
    anyway (r08 verdict item 5: the skipped job was ~1/3 of q185's
    per-round job count).  Nodes are the edge endpoints; seeds outside
    the graph are ignored (the seed frame is assumed cohort-sized and
    broadcasts into the setup join); raises if no seed is in the graph
    (every rank would be 0 — a caller bug, not a result).

    Distributed shape: identical to :func:`pagerank`'s broadcast path —
    the |nodes|-row rank frame broadcasts into one map-side hash join
    over the checkpointed edge partitions per round, the aggregate is
    map-side combined, and the rank update joins the CHECKPOINTED node
    state (not the previous rank frame), so each round's plan references
    the previous ranks exactly once — which lets a dangling-free graph
    with a small-enough edge list (``chain_max_edge_rows``) chain rounds
    lazily and checkpoint every ``small_checkpoint_every`` rounds (r11,
    :func:`pagerank`'s cadence rationale and chain gate; a graph with
    dangling mass keeps the every-round checkpoint because its dangling
    aggregate is a second reference to the rank frame, and a large edge
    list keeps it because chaining measured erratic there).  This call's
    checkpoints release on exit, ownership-scoped.  Edges
    are distinct-ed defensively unless ``assume_distinct_edges``
    (:func:`pagerank`'s contract verbatim: a duplicated edge would
    double-count its contribution, so True is the CALLER's promise that
    the dedup shuffle was already paid).  Rounds
    snap to a 9dp grid so summation-order noise cannot accumulate
    (the q69 oracle convention).

    Output: node, rank (double, 6dp).
    """
    spark = edges.sparkSession
    created: set[int] = set()
    # any failure (a raise below, or a Spark action dying mid-round)
    # must not strand this call's localCheckpoint blocks — the
    # r11 review finding: the error path leaked `created` (the same
    # degradation _unpersist_rdds documents for the success path)
    try:
        e = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        if not assume_distinct_edges:
            e = e.distinct()
        e = e.localCheckpoint()
        created |= _pinned_rdd_ids(e)
        # node state in ONE map-side-combined aggregate over the edge
        # endpoints (src endpoints count toward out-degree, dst endpoints
        # only assert existence) — pagerank's nd shape; the previous
        # distinct-union ⋈ degree-aggregate chain paid two extra
        # exchanges and a join for the identical (node, deg) rows
        nd = (
            e.select(F.col("src").alias("node"), F.lit(1).alias("__is_src"))
            .unionByName(
                e.select(F.col("dst").alias("node"), F.lit(0).alias("__is_src"))
            )
            .groupBy("node")
            .agg(F.sum("__is_src").alias("deg"))
        )
        seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
        state = (
            nd.join(
                F.broadcast(seed_nodes.withColumn("__sflag", F.lit(1))),
                "node",
                "left",
            )
            .select(
                "node",
                F.coalesce(F.col("__sflag"), F.lit(0)).alias("__is_seed"),
                "deg",
            )
            .localCheckpoint()
        )
        created |= _pinned_rdd_ids(state)
        # both one-time setup scalars (seed count; the dangling flag that
        # skips the per-round dangling-mass job — the exactly-0.0
        # dm·seed_share term is a no-op in IEEE arithmetic on symmetric
        # graphs) ride ONE aggregate over the checkpointed state instead
        # of an agg job + a filter-scan job (r10: one fewer setup action)
        setup = state.agg(
            F.sum("__is_seed").alias("ns"),
            F.max(F.when(F.col("deg") == 0, 1).otherwise(0)).alias("hd"),
            # total out-degree == |E| — free here, feeds the chain gate
            F.coalesce(F.sum("deg"), F.lit(0)).alias("te"),
        ).first()
        n_seeds = setup["ns"]
        total_edges = int(setup["te"])
        if not n_seeds:
            raise ValueError("personalized_pagerank: no seed is present in the graph")
        has_dangling = bool(setup["hd"])
        seed_share = F.col("__is_seed").cast("double") / float(n_seeds)
        ranks = state.select(
            "node", "__is_seed", "deg", seed_share.alias("rank")
        ).localCheckpoint()
        created |= _pinned_rdd_ids(ranks)
        d = float(damping)
        if small_checkpoint_every < 1:
            raise ValueError(
                f"small_checkpoint_every must be >= 1, got {small_checkpoint_every}"
            )
        # lineage-cut cadence (docstring / pagerank's rationale + chain
        # gate): the rank update joins the checkpointed `state`, so the
        # previous rank frame appears exactly once per round plan (inside
        # the inflow broadcast) unless the dangling aggregate adds a
        # second reference; large edge lists keep every-round cuts
        cut_every = (
            small_checkpoint_every
            if not has_dangling and total_edges <= chain_max_edge_rows
            else 1
        )
        for i in range(n_iter):
            inflow = (
                e.join(
                    F.broadcast(
                        ranks.where(F.col("deg") > 0).select(
                            F.col("node").alias("src"),
                            (F.col("rank") / F.col("deg")).alias("__contrib"),
                        )
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("__contrib").alias("__inflow"))
            )
            nxt = state.join(F.broadcast(inflow), "node", "left")
            damped = F.coalesce(F.col("__inflow"), F.lit(0.0))
            if has_dangling:
                dangling = ranks.where(F.col("deg") == 0).agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
                )
                nxt = nxt.crossJoin(F.broadcast(dangling))
                damped = damped + F.col("__dm") * seed_share
            nxt = nxt.select(
                "node",
                "__is_seed",
                "deg",
                ((1.0 - d) * seed_share + d * damped).alias("rank"),
            )
            if per_iter_round_dp is not None:
                nxt = nxt.withColumn("rank", F.round("rank", per_iter_round_dp))
            ranks = nxt
            if (i + 1) % cut_every == 0 or i == n_iter - 1:
                ranks = ranks.localCheckpoint()
                created |= _pinned_rdd_ids(ranks)
        out = ranks.select("node", (F.round("rank", 6) + F.lit(0.0)).alias("rank"))
        res = out.localCheckpoint()
        _unpersist_rdds(spark, created - _pinned_rdd_ids(res))
        return res
    except BaseException:
        _unpersist_rdds(spark, created)
        raise


def k_core(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    max_rounds: int = 20,
    broadcast_nodes_max: int = 1_000_000,
    broadcast_min_edge_rows: int = 1_000_000,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node keeps degree ≥ k — the density filter that separates a
    community's load-bearing members from its periphery (triangles/
    coefficients score nodes, the core is the SET that survives
    together; spam-farm detection and community-nucleus extraction
    both start here).

    Iterative peeling, the :func:`connected_components` driver
    contract: each round is one distributed degree-aggregate + one
    semi-join filter of the edge list (drop every edge touching a
    node whose CURRENT degree < k); the driver only checks "did the
    edge count move".  Peeling is monotone — the fixpoint is the
    unique k-core regardless of round order, and EXTRA rounds past the
    fixpoint are no-ops, which is what makes a fixed-unroll oracle
    valid (the q39/q69 idempotent-tail convention).  Converges in at
    most |peeled layers| rounds; RAISES past ``max_rounds`` rather
    than returning a partially-peeled (supergraph) answer.

    Each round's survivor edge list localCheckpoints (lineage would
    otherwise double per round) and this call's checkpoints release on
    exit, ownership-scoped.  Output: node, core_degree (bigint — the
    node's degree WITHIN the core), empty when no k-core exists.

    Join strategy is the :func:`pagerank` dispatch with the edge-volume
    gate (see :func:`label_propagation`'s docstring for the measured
    two-way A/B): when the edge list is large enough that its per-round
    exchange dominates (``broadcast_min_edge_rows``) and the node set
    fits (``broadcast_nodes_max``, one node-count job paid only past
    the edge gate), the per-round survivor set (``keep``, ≤ |V| rows)
    BROADCASTS into the two semi-joins, so the checkpointed edge list
    is filtered map-side instead of being exchanged+sorted twice per
    peel round (a localCheckpoint'd frame has no Catalyst statistics,
    so without the hint both semi-joins plan as sort-merge).  Results
    are bit-identical (integer degree filter); smaller graphs keep the
    sort-merge form.
    """
    spark = edges.sparkSession
    created: set[int] = set()
    # any failure (a raise below, or a Spark action dying mid-round)
    # must not strand this call's localCheckpoint blocks — the
    # r11 review finding: the error path leaked `created` (the same
    # degradation _unpersist_rdds documents for the success path)
    try:
        u, v = F.col(src_col), F.col(dst_col)
        e = (
            edges.where(u != v)
            .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
            .distinct()
            .localCheckpoint()
        )
        created |= _pinned_rdd_ids(e)
        n_edges = e.count()
        # join-strategy dispatch (pagerank's, with the edge-volume gate —
        # see label_propagation's docstring).  The edge gate
        # short-circuits first, so small graphs pay nothing extra; only
        # a large graph pays the one-time node count (dense graphs have
        # |V| far below 2·|E|, so a 2·|E| proxy would wrongly veto the
        # broadcast exactly where it pays most).
        bc = (
            F.broadcast
            if (
                n_edges >= broadcast_min_edge_rows
                and e.select(F.col("u").alias("node"))
                .unionAll(e.select(F.col("v").alias("node")))
                .distinct()
                .count()
                <= broadcast_nodes_max
            )
            else (lambda df: df)
        )
        for _ in range(max_rounds):
            if n_edges == 0:
                break
            deg = (
                e.select(F.col("u").alias("node"))
                .unionAll(e.select(F.col("v").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("d"))
            )
            keep = deg.where(F.col("d") >= k).select("node")
            nxt = (
                e.join(bc(keep.select(F.col("node").alias("u"))), "u", "left_semi")
                .join(bc(keep.select(F.col("node").alias("v"))), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint()
            )
            created |= _pinned_rdd_ids(nxt)
            n_next = nxt.count()
            e = nxt
            # n_next == 0 IS the fixpoint (the empty graph is trivially
            # stable) — without it, peeling to empty on the final permitted
            # round would hit the for-else RuntimeError (r07 ADVICE item 3)
            if n_next == n_edges or n_next == 0:
                break
            n_edges = n_next
        else:
            raise RuntimeError(
                f"k_core did not reach a fixpoint in {max_rounds} rounds — "
                "raise max_rounds; returning a partially-peeled supergraph "
                "would be silently wrong"
            )
        out = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
            .localCheckpoint()
        )
        _unpersist_rdds(spark, created - _pinned_rdd_ids(out))
        return out
    except BaseException:
        _unpersist_rdds(spark, created)
        raise


def sql_k_core(
    edges_sql: str, src_col: str, dst_col: str, k: int, n_rounds: int = 20
) -> str:
    """DuckDB twin of :func:`k_core`: the peel unrolled ``n_rounds``
    times (extra rounds past the fixpoint are no-ops — the
    idempotent-tail convention that makes a fixed unroll equal the
    loop-until-stable kernel), each round MATERIALIZED."""
    parts = [
        f"""
e0 AS MATERIALIZED (
  SELECT DISTINCT least({src_col}, {dst_col}) AS u,
                  greatest({src_col}, {dst_col}) AS v
  FROM ({edges_sql}) WHERE {src_col} <> {dst_col}
)"""
    ]
    for i in range(1, n_rounds + 1):
        parts.append(
            f"""
d{i} AS (
  SELECT node FROM (
    SELECT node, COUNT(*) AS d FROM (
      SELECT u AS node FROM e{i - 1} UNION ALL SELECT v FROM e{i - 1}
    ) GROUP BY node
  ) WHERE d >= {k}
),
e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{i - 1} e
  WHERE e.u IN (SELECT node FROM d{i}) AND e.v IN (SELECT node FROM d{i})
)"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM (SELECT u AS node FROM e{n_rounds} UNION ALL SELECT v FROM e{n_rounds})
GROUP BY node
"""
    )


def label_propagation(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    n_rounds: int = 5,
    broadcast_nodes_max: int = 1_000_000,
    broadcast_min_edge_rows: int = 1_000_000,
    checkpoint_every: int = 2,
    chain_max_edge_rows: int = 4_000_000,
) -> DataFrame:
    """Synchronous label-propagation communities (LPA, Raghavan et al.):
    every node starts as its own label, and each round adopts the most
    frequent label among its NEIGHBORS (ties to the smallest label;
    isolated update keeps the current label).  After a handful of rounds
    dense regions agree on one label — the community buckets that turn
    corpus-wide dedup/near-dup into per-community work (the pipeline use:
    a semantic sibling of :func:`connected_components` that splits a
    connected blob into its dense parts instead of reporting it whole).

    CONTRACT — fixed trajectory, not loop-until-stable: synchronous LPA
    can oscillate 2-cycles on bipartite-ish regions, so there is no
    monotone fixpoint for an idempotent-tail oracle to hit (the k_core
    situation).  Instead BOTH engines walk the identical deterministic
    trajectory for exactly ``n_rounds`` rounds — the update rule
    (count DESC, label ASC argmax over neighbor labels) has no ties left
    to the engine, so round t's labels are bit-identical across engines
    and the unrolled-CTE oracle (:func:`sql_label_propagation`) IS the
    kernel by construction.  More rounds = coarser communities; 5 is the
    usual near-convergence point (Raghavan et al. report >=95% of nodes
    settled by round 5).

    Scale shape: per round ONE shuffle keyed on the neighbor node — join
    current labels (|V| rows) onto the symmetric edge list, count
    (node, label) with map-side combine, and ``max_by(label,
    struct(cnt, -label))`` collapses the argmax inside the same
    aggregate; the label frame localCheckpoints every
    ``checkpoint_every`` rounds when the edge list is at most
    ``chain_max_edge_rows`` (r11: each round's plan references the
    previous label frame exactly ONCE — the old per-round label-update
    join is gone — so rounds chain lazily between lineage cuts; the
    q188-graph A/B measured cadence 2 at 3.18 s vs every-round 3.61 s
    and full-chain 3.27 s, bit-identical, and the 100x disjoint-copy
    graph (714k sym edges) still favored cadence 2, 32.4 vs 34.5 s —
    but pagerank's chain measured ERRATIC on a 17.9M-edge graph, so
    large edge lists keep the every-round cut, pagerank's chain-gate
    rationale) with ownership-scoped release.  No driver state beyond
    the round counter; edges checkpoint ONCE.

    Join strategy follows :func:`pagerank`'s dispatch with an
    edge-volume gate: when ``|V| <= broadcast_nodes_max`` AND the
    symmetric edge list holds at least ``broadcast_min_edge_rows`` rows,
    the per-round label frame BROADCASTS into the one edge join (since
    r11 the argmax aggregate IS the next label frame — the old
    label-update join was a row-wise no-op, see the loop comment — so
    there is exactly one join per round), and the checkpointed edge
    partitions are never exchanged or sorted — each round becomes one map-side hash
    join + one map-side-combined aggregate (LPA's labels-onto-edges
    join is pagerank's shape, which measured 2.0–2.2× faster broadcast
    at 1.8M/17.9M edges).  The statistics of a localCheckpoint'd frame
    are unknown to Catalyst (``LogicalRDD`` reports the default size),
    so without the explicit hint every round plans a sort-merge join
    that shuffles the EDGE list.  The edge gate exists because the
    broadcast spends ~2 fixed driver barriers (collect + ship) per
    round, which only pays once the avoided edge exchange is large —
    measured 2026-08-17 on the same code: the 3.6k-edge co-purchase
    graph ran 4.4 s sort-merge vs 12.4 s broadcast, while the
    3.6M-sym-edge contact graph ran 6.9/5.6 s sort-merge vs 5.3/4.9 s
    broadcast.  Results are bit-identical either way (integer counts,
    deterministic argmax); both thresholds are caller-tunable for
    cluster deployments where the exchange-vs-barrier balance differs.

    Output: ``node``, ``community`` (bigint; the round-``n_rounds``
    label), ``community_size`` (bigint — members sharing the label).

    Node ids MUST be an integral type: initial labels are the node ids
    cast to bigint, and a silent Spark cast of non-numeric ids would
    yield NULL labels (garbage communities) while the DuckDB twin's
    ``CAST(... AS BIGINT)`` raises — divergent failure modes for the
    same misuse (r08 ADVICE item 3).  The operator validates and raises
    instead; pre-assign dense ids (e.g. ``xxhash64`` is NOT enough —
    collisions would merge labels — use ``zipWithIndex``-style
    ``row_number`` over distinct nodes) for string-keyed graphs.
    """
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    _integral = {"tinyint", "smallint", "int", "bigint"}
    dtypes = dict(edges.dtypes)
    for c in (src_col, dst_col):
        dt = dtypes.get(c)
        if dt not in _integral:
            raise TypeError(
                f"label_propagation requires integral node ids; column "
                f"{c!r} is {dt!r}. Initial labels are node ids cast to "
                "bigint — a non-numeric id would silently become a NULL "
                "label. Map string keys to dense bigint ids first."
            )
    spark = edges.sparkSession
    created: set[int] = set()
    # any failure (a raise below, or a Spark action dying mid-round)
    # must not strand this call's localCheckpoint blocks — the
    # r11 review finding: the error path leaked `created` (the same
    # degradation _unpersist_rdds documents for the success path)
    try:
        u, v = F.col(src_col), F.col(dst_col)
        sym = (
            edges.where(u != v)
            .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
            .distinct()
        )
        e = (
            sym.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(sym.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .localCheckpoint()
        )
        created |= _pinned_rdd_ids(e)
        lab = (
            e.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").cast("bigint").alias("lbl"))
            .localCheckpoint()
        )
        created |= _pinned_rdd_ids(lab)
        # two scalars (counts of the checkpointed frames) pick the join
        # strategy ONCE — the pagerank dispatch with an edge-volume gate
        # (docstring); the edge gate short-circuits first so small graphs
        # never pay the label-count job.  The edge count doubles as the
        # chain gate (docstring cadence).
        n_edges = e.count()
        small = (
            n_edges >= broadcast_min_edge_rows
            and lab.count() <= broadcast_nodes_max
        )
        bc = F.broadcast if small else (lambda df: df)
        cut_every = checkpoint_every if n_edges <= chain_max_edge_rows else 1
        for i in range(n_rounds):
            nb = e.join(bc(lab.withColumnRenamed("node", "src")), "src").select(
                F.col("dst").alias("node"), "lbl"
            )
            # the argmax aggregate IS the next label frame (r11): `e` is
            # symmetric by construction (both directions of every sym
            # pair), so every labeled node appears as a dst and `pick`
            # covers the full node set — the old `lab LEFT JOIN pick` +
            # coalesce(new_lbl, lbl) update (one |V|⋈|V| join per round:
            # two exchanges + sorts on the sort-merge arm, one broadcast
            # barrier on the broadcast arm) was provably a no-op row-wise
            # and is removed.  The isolated-node coalesce the update
            # encoded can never fire here: lab's nodes are e's endpoints.
            lab = (
                nb.groupBy("node", "lbl")
                .agg(F.count(F.lit(1)).alias("c"))
                .groupBy("node")
                .agg(
                    F.expr("max_by(lbl, struct(c, -lbl))").alias("lbl")
                )
            )
            # lineage cut (docstring cadence) — the final round always
            # checkpoints: the community-size readout references it twice
            if (i + 1) % cut_every == 0 or i == n_rounds - 1:
                lab = lab.localCheckpoint()
                created |= _pinned_rdd_ids(lab)
        out = (
            lab.join(
                bc(
                    lab.groupBy("lbl").agg(
                        F.count(F.lit(1)).alias("community_size")
                    )
                ),
                "lbl",
            )
            .select(
                "node",
                F.col("lbl").cast("bigint").alias("community"),
                F.col("community_size").cast("bigint").alias("community_size"),
            )
            .localCheckpoint()
        )
        _unpersist_rdds(spark, created - _pinned_rdd_ids(out))
        return out
    except BaseException:
        _unpersist_rdds(spark, created)
        raise


def sql_label_propagation(
    edges_sql: str, src_col: str, dst_col: str, n_rounds: int = 5
) -> str:
    """DuckDB twin of :func:`label_propagation`: the fixed trajectory
    unrolled ``n_rounds`` times, each round MATERIALIZED; the argmax is
    the same (count DESC, label ASC) rule via ROW_NUMBER."""
    parts = [
        f"""
sym AS MATERIALIZED (
  SELECT DISTINCT least({src_col}, {dst_col}) AS a,
                  greatest({src_col}, {dst_col}) AS b
  FROM ({edges_sql}) WHERE {src_col} <> {dst_col}
),
e AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM sym
  UNION ALL
  SELECT b AS src, a AS dst FROM sym
),
l0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS lbl FROM e
)"""
    ]
    for t in range(1, n_rounds + 1):
        parts.append(
            f"""
c{t} AS (
  SELECT e.dst AS node, l.lbl, COUNT(*) AS c
  FROM e JOIN l{t - 1} l ON l.node = e.src
  GROUP BY 1, 2
),
p{t} AS (
  SELECT node, lbl AS new_lbl FROM (
    SELECT node, lbl,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
    FROM c{t}
  ) WHERE rn = 1
),
l{t} AS MATERIALIZED (
  SELECT l.node, COALESCE(p.new_lbl, l.lbl) AS lbl
  FROM l{t - 1} l LEFT JOIN p{t} p ON p.node = l.node
)"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT node, CAST(lbl AS BIGINT) AS community,
       CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
FROM l{n_rounds}
"""
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str,
    dst_col: str,
    node_col: str = "node",
    label_col: str = "community",
    broadcast_nodes_max: int = 1_000_000,
    broadcast_min_edge_rows: int = 1_000_000,
) -> DataFrame:
    """Exact Newman modularity of a community assignment, per community —
    the evaluation side of :func:`label_propagation` (did LPA actually
    find dense parts?) and the standard quality gate before community
    buckets feed downstream dedup/curation.

    For each community c: ``contribution_c = (4·m·m_c − D_c²) / (4·m²)``
    where ``m`` = undirected edge count, ``m_c`` = edges internal to c,
    ``D_c`` = degree sum of c's members; ``Q = Σ_c contribution_c``.
    The numerator stays an EXACT integer (DECIMAL(38,0) / HUGEINT) and
    the division happens ONCE on two exactly-derived doubles — the same
    IEEE conversion + single divide in both engines, so no rounding is
    needed (the q155 numerator discipline applied to a quotient).

    Scale shape: one canonicalize+distinct of the edge list, one degree
    aggregate, two label equi-joins keyed on the edge endpoints (the
    inverted-index multiplicity — never a cross product), one collected
    edge-count scalar (exact integer, inlined as a literal into the
    contribution arithmetic — the identical value the previous 1-row
    agg-frame cross join carried), and per-community aggregates.  Labels for nodes
    absent from ``labels`` would drop edges silently, so the operator
    inner-joins and the caller owns completeness (LPA labels every
    endpoint by construction).

    Join strategy is the :func:`pagerank` dispatch: when the label
    table is ``<= broadcast_nodes_max`` rows (one cheap count — labels
    are usually LPA's already-checkpointed output) it BROADCASTS into
    the degree join and both endpoint joins, so the canonical edge list
    is scanned map-side instead of exchanged+sorted twice (label frames
    from localCheckpoint have no Catalyst statistics, so the planner
    would otherwise sort-merge every one of these).  Bit-identical
    results (integer counts/sums); larger graphs keep sort-merge.

    Output: ``community``, ``n_members``, ``internal_edges``,
    ``degree_sum`` (bigints), ``contribution`` (double).  The canonical
    edge list is localCheckpoint'd (it feeds the count, the degree
    aggregate AND the two label joins — lazy it would recompute the
    caller's edge derivation per subtree) and the result checkpoints
    with ownership-scoped release, the iterative-family contract: one
    pinned frame per call, the returned one.

    Overflow bound (r08 ADVICE item 4): the exact numerators live in
    Spark DECIMAL(38,0), where multiplication overflow under the
    default non-ANSI mode yields NULL silently while the DuckDB twin's
    HUGEINT (128-bit) keeps going.  The widest product is ``4·m²``
    (``D_c ≤ 2m`` and ``m_c ≤ m`` keep every other term under it), so
    the contract holds for ``m < 5·10^18`` undirected edges — beyond
    any realizable corpus (100 TB of 8-byte edge pairs is ~6·10^12).
    Past that bound the engines diverge (Spark NULL contribution vs
    DuckDB exact) rather than fail loudly; enable ANSI mode
    (``spark.sql.ansi.enabled``) to turn the overflow into an error.
    """
    spark = edges.sparkSession
    created: set[int] = set()
    # any failure (a raise below, or a Spark action dying mid-round)
    # must not strand this call's localCheckpoint blocks — the
    # r11 review finding: the error path leaked `created` (the same
    # degradation _unpersist_rdds documents for the success path)
    try:
        dec = "decimal(38,0)"
        u, v = F.col(src_col), F.col(dst_col)
        e = (
            edges.where(u != v)
            .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
            .distinct()
            .localCheckpoint()
        )
        created |= _pinned_rdd_ids(e)
        lab = labels.select(
            F.col(node_col).alias("node"), F.col(label_col).alias("community")
        )
        # the edge count is needed by the modularity arithmetic anyway —
        # collect it once (exact integer; inlined as a literal below, the
        # identical value the old 1-row agg frame carried) and let it
        # double as the dispatch scalar, so the edge-volume gate costs no
        # extra job; the label count is one cheap job over the caller's
        # (usually checkpointed) label frame
        m_val = e.count()
        # the edge gate short-circuits first: small graphs skip the
        # label-count job entirely
        bc = (
            F.broadcast
            if (
                m_val >= broadcast_min_edge_rows
                and lab.count() <= broadcast_nodes_max
            )
            else (lambda df: df)
        )
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        dc = (
            bc(lab).join(deg, "node")
            .groupBy("community")
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.sum(F.col("d").cast(dec)).alias("degree_sum"),
            )
        )
        mc = (
            e.join(bc(lab.select(F.col("node").alias("u"), F.col("community").alias("ca"))), "u")
            .join(bc(lab.select(F.col("node").alias("v"), F.col("community").alias("cb"))), "v")
            .where(F.col("ca") == F.col("cb"))
            .groupBy(F.col("ca").alias("community"))
            .agg(F.count(F.lit(1)).cast(dec).alias("internal_edges"))
        )
        m = F.lit(m_val).cast(dec)
        num = (
            F.lit(4).cast(dec) * m * F.coalesce(F.col("internal_edges"), F.lit(0).cast(dec))
            - F.col("degree_sum") * F.col("degree_sum")
        )
        den = F.lit(4).cast(dec) * m * m
        out = (
            dc.join(mc, "community", "left")
            .select(
                "community",
                F.col("n_members").cast("bigint").alias("n_members"),
                F.coalesce(F.col("internal_edges"), F.lit(0))
                .cast("bigint")
                .alias("internal_edges"),
                F.col("degree_sum").cast("bigint").alias("degree_sum"),
                (num.cast("double") / den.cast("double")).alias("contribution"),
            )
            .localCheckpoint()
        )
        _unpersist_rdds(spark, created - _pinned_rdd_ids(out))
        return out
    except BaseException:
        _unpersist_rdds(spark, created)
        raise


def sql_modularity(
    edges_sql: str,
    labels_sql: str,
    src_col: str,
    dst_col: str,
    node_col: str = "node",
    label_col: str = "community",
) -> str:
    """DuckDB twin of :func:`modularity`; ``labels_sql`` is any query
    yielding (node, community) — e.g. :func:`sql_label_propagation`
    wrapped as a subquery."""
    # CTE names are mq_-prefixed: labels_sql is typically the unrolled
    # LPA trajectory, whose own CTEs (e, sym, l0…) would otherwise
    # collide with these at the top level (DuckDB flattens the scopes —
    # "Duplicate alias" binder error, hit on the first q189 run)
    return f"""
WITH mq_e AS MATERIALIZED (
  SELECT DISTINCT least({src_col}, {dst_col}) AS u,
                  greatest({src_col}, {dst_col}) AS v
  FROM ({edges_sql}) WHERE {src_col} <> {dst_col}
),
mq_lab AS MATERIALIZED (
  SELECT {node_col} AS node, {label_col} AS community FROM ({labels_sql})
),
mq_m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM mq_e),
mq_deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM mq_e UNION ALL SELECT v FROM mq_e
  ) GROUP BY node
),
mq_dc AS (
  SELECT community, COUNT(*) AS n_members,
         SUM(CAST(d AS HUGEINT)) AS degree_sum
  FROM mq_lab JOIN mq_deg USING (node) GROUP BY 1
),
mq_mc AS (
  SELECT la.community, CAST(COUNT(*) AS HUGEINT) AS internal_edges
  FROM mq_e
  JOIN mq_lab la ON la.node = mq_e.u
  JOIN mq_lab lb ON lb.node = mq_e.v
  WHERE la.community = lb.community
  GROUP BY 1
)
SELECT mq_dc.community,
       CAST(mq_dc.n_members AS BIGINT) AS n_members,
       CAST(COALESCE(mq_mc.internal_edges, 0) AS BIGINT) AS internal_edges,
       CAST(mq_dc.degree_sum AS BIGINT) AS degree_sum,
       CAST(4 * mq_m.m * COALESCE(mq_mc.internal_edges, 0)
            - mq_dc.degree_sum * mq_dc.degree_sum AS DOUBLE)
         / CAST(4 * mq_m.m * mq_m.m AS DOUBLE) AS contribution
FROM mq_dc LEFT JOIN mq_mc USING (community) CROSS JOIN mq_m
"""
