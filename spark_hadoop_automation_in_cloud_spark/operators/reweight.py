"""Iterative mixture reweighting by exponentiated gradient — the
DoReMi-shaped step of pretraining-data curation: instead of hand-picked
domain weights (q125's Pile-style literals) or a single keep-rate
readout (q198/q201), LEARN the weights by repeatedly upweighting the
domains a reference gate finds hardest, against a moving
weighted-average baseline.

    w_d(0)  = 1/k
    b(i)    = Σ_d w_d(i−1) · loss_d            (the moving baseline)
    u_d(i)  = w_d(i−1) · exp(η · (loss_d − b(i)))
    w_d(i)  = round(u_d(i) / Σ u(i), 7)        (normalize + snap)

``loss_d`` is a per-domain scalar distilled ONCE from the corpus (here:
the mean hinge of q197's linear gate, ``mean(max(0, −score))`` — how far
below the keep threshold the domain's documents sit).  Because the
per-domain losses are fixed, every round after the one corpus aggregate
is |domains|-sized arithmetic — the correct 100 TB shape: one scan, then
a driver-bounded trajectory.  The iteration is still genuine (the
baseline moves with the weights, so no closed form reproduces the
snapped trajectory), and both engines walk it on the IDENTICAL per-round
spelling (:func:`_sql_round`): the DuckDB oracle unrolls the rounds as
one CTE chain (:func:`sql_reweight_ctes`), Spark executes the WHOLE
trajectory as one chained-fold query over the |domains|-row literal
state (:func:`exp_gradient_weights`, r11; r10 ran one fold query per
round) — the q69/q197 trajectory discipline.
The 7dp per-round snap re-synchronizes the engines' exp/summation ulp
wobble (~k·1e−16 per round, nine orders under the grid).

Why Spark does NOT execute the unrolled chain directly: Spark inlines a
CTE at every reference site (no ``AS MATERIALIZED``), and each round
references the previous round's weights twice and the cell table twice —
so the chained plan grows ~4× per round, 4^n subtrees with their own
exchanges.  Measured: 117 s for 5 rounds over a TWENTY-row cell table as
one query; ~1 s executed round-per-query.  DuckDB has the same inlining
hazard, which is why the oracle chain emits ``AS MATERIALIZED``.

Why Spark's per-round execution inlines the state as LITERALS instead of
re-materializing temp-view DataFrames (the r10 optimization): the round
inputs are |domains| collected rows, and the original
createDataFrame→createOrReplaceTempView→join→collect cycle cost
~1.3 s/round of pure py4j + join planning overhead (6.4 s of q202's
10.8 s wall at sf0.1, measured 2026-08-17 — a 20-row computation).
Inlining the cells and the previous round's weights as literal arrays
and folding the two SUMs as row-local ``aggregate`` over those arrays
makes the rounds single-row, join-free array folds (~0.1 s/round in
r10's round-per-query form; ONE query for the whole trajectory since
r11): same multiplies, same adds in the same left-to-right order (a
single-partition SUM accumulates rows sequentially in input order,
exactly like the fold; the products are >= +0.0 so the fold's 0.0 seed
is an exact identity), same ``exp``, same 7dp snap.  Equality with the
fragment form holds UNDER THE 7dp SNAP and is pinned by the
cross-engine property test and the q202/q205 oracle rows — the fold
accumulates in cells order, which the old round-per-query SUM also did,
but don't lean on strict bit-level construction at exact half
boundaries when modifying the fold (r10 ADVICE item 4).

Direction note: hard domains gain weight (excess loss > 0 ⇒ multiplier
> 1) — DoReMi's Group-DRO direction, which spends budget where the
cheap gate says the data is hardest; flip ``eta``'s sign for the
quality-seeking variant.
"""

from __future__ import annotations


def _sql_round(
    cells_src: str, i: int, prev: str, eta: float, dp: int, m: str
) -> list[str]:
    """ONE weight round (``rb{i}``/``ru{i}``/``rz{i}``/``rw{i}``) as CTE
    parts over ``prev`` = the previous round's ``(domain, w)`` relation —
    the single spelling of the round arithmetic that both the unrolled
    oracle chain and Spark's round-per-query executor emit."""
    return [
        f"rb{i} AS{m} (SELECT SUM(w.w * c.mean_loss) AS b"
        f" FROM {prev} w JOIN {cells_src} c USING (domain))",
        f"ru{i} AS{m} (SELECT c.domain,"
        f" w.w * exp({eta!r} * (c.mean_loss - rb.b)) AS uw"
        f" FROM {cells_src} c JOIN {prev} w USING (domain)"
        f" CROSS JOIN rb{i} rb)",
        f"rz{i} AS{m} (SELECT SUM(uw) AS z FROM ru{i})",
        f"rw{i} AS{m} (SELECT domain, round(uw / z, {dp}) AS w"
        f" FROM ru{i} CROSS JOIN rz{i})",
    ]


def _sql_init(cells_src: str, m: str) -> list[str]:
    """Round 0: uniform weights — shared by the chain and the executor."""
    return [
        f"rk AS{m} (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM {cells_src})",
        f"rw0 AS{m} (SELECT domain, 1.0 / rk.k AS w"
        f" FROM {cells_src} CROSS JOIN rk)",
    ]


def sql_reweight_ctes(
    cells_src: str,
    n_rounds: int = 5,
    eta: float = 0.5,
    dp: int = 7,
    materialized: bool = True,
) -> str:
    """The weight trajectory as a CTE-chain fragment (``rk``, ``rw0``,
    then per round ``rb{i}``/``ru{i}``/``rz{i}``/``rw{i}``) over a cell
    table exposing ``domain`` and ``mean_loss``.  ``materialized``
    emits DuckDB's ``AS MATERIALIZED`` (load-bearing for unrolled
    iterative oracles — un-materialized 1-row round CTEs inline
    exponentially); Spark SQL has no such attribute AND inlines every
    reference, which is why :func:`exp_gradient_weights` never runs
    this chain whole (module docstring).  The ARITHMETIC is the
    per-round fragment either way."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    m = " MATERIALIZED" if materialized else ""
    parts = _sql_init(cells_src, m)
    for i in range(1, n_rounds + 1):
        parts.extend(_sql_round(cells_src, i, f"rw{i - 1}", eta, dp, m))
    return ",\n".join(parts)


def sql_reweight_select(
    cells_src: str, n_rounds: int, total_budget: int
) -> str:
    """The final readout over the trajectory's last round: per domain,
    the cell stats, the learned weight, and the implied token budget
    (``floor(total · w)`` — identical IEEE multiply+floor on both
    engines)."""
    return f"""
SELECT c.domain AS source,
       c.n_docs,
       c.mean_loss,
       r.w AS weight,
       CAST(FLOOR({total_budget} * r.w) AS BIGINT) AS token_budget
FROM {cells_src} c
JOIN rw{n_rounds} r USING (domain)
ORDER BY source
"""


def _sql_str(s: str) -> str:
    """A string literal: backslashes doubled FIRST (Spark SQL parses
    backslash escapes in string literals by default, so an un-doubled
    backslash would silently mutate an inlined domain name — r10 ADVICE
    item 1), then single quotes doubled."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def _sql_double(v: float) -> str:
    """An exact double literal: ``repr`` round-trips the shortest decimal
    that parses back to the same IEEE double, and Spark's string→double
    cast is correctly rounded — so the engine sees the bit-identical
    value the driver collected."""
    import math

    if not math.isfinite(v):
        raise ValueError(f"non-finite weight/loss in reweight state: {v!r}")
    return f"CAST('{v!r}' AS DOUBLE)"


def _sql_fold_chain_query(
    cell_rows, w0: float, eta: float, dp: int, n_rounds: int
) -> str:
    """The WHOLE weight trajectory as one single-row, join-free query
    over literal state — each round is the same arithmetic as
    :func:`_sql_round` (same per-domain products, the two SUMs
    accumulated as array folds in the same cells order, same ``exp``,
    same per-round ``round``), chained through nested FROM subqueries so
    every level is referenced exactly ONCE (linear plan growth — unlike
    the CTE chain, which Spark inlines at every reference site, ~4^n).
    r10 ran one such fold query PER round (n_rounds driver round-trips,
    each re-inlining the collected weights as repr literals — an exact
    IEEE round-trip); r11 carries the weight array in-plan instead, so
    the trajectory costs ONE job.  Values are identical under the
    per-round ``dp`` snap (same folds, same order, same exp/round —
    equality pinned by the cross-engine property test and the q202/q205
    oracle rows, not claimed from construction alone: the fold order
    matches the single-partition SUM's input order, and the 7dp snap's
    9-orders slack absorbs any half-boundary hazard)."""
    arr = ", ".join(
        f"named_struct('domain', {_sql_str(d)}, 'ml', {_sql_double(ml)},"
        f" 'w', {_sql_double(w0)})"
        for d, ml in cell_rows
    )
    qry = f"SELECT array({arr}) AS cw"
    for _ in range(n_rounds):
        qry = (
            "SELECT cw, aggregate(cw, CAST(0.0 AS DOUBLE),"
            f" (acc, x) -> acc + x.w * x.ml) AS b FROM ({qry})"
        )
        qry = (
            "SELECT transform(cw, x -> named_struct('domain', x.domain,"
            f" 'ml', x.ml, 'uw', x.w * exp({eta!r} * (x.ml - b)))) AS us"
            f" FROM ({qry})"
        )
        qry = (
            "SELECT us, aggregate(us, CAST(0.0 AS DOUBLE),"
            f" (acc, x) -> acc + x.uw) AS z FROM ({qry})"
        )
        qry = (
            "SELECT transform(us, x -> named_struct('domain', x.domain,"
            f" 'ml', x.ml, 'w', round(x.uw / z, {dp}))) AS cw FROM ({qry})"
        )
    return (
        "SELECT explode(transform(cw, x -> named_struct('domain', x.domain,"
        f" 'w', x.w))) AS r FROM ({qry})"
    )


def exp_gradient_weights(
    spark,
    cells,
    n_rounds: int = 5,
    eta: float = 0.5,
    total_budget: int = 20_000,
):
    """Run the trajectory IN SPARK over a (domain, n_docs, mean_loss)
    DataFrame — the per-round arithmetic of :func:`_sql_round` with the
    |domains|-row state collected once and inlined as LITERALS (bounded
    model state — the q96 broadcast-centroid contract): the WHOLE
    trajectory is ONE single-row, join-free query of chained array folds
    (:func:`_sql_fold_chain_query`; r10 ran one such query per round —
    n_rounds driver round-trips — and the earlier temp-view/join form
    cost ~1.3 s/round of planning overhead for a 20-row computation,
    while executing the unrolled CTE chain as a single query hits
    Spark's inline-at-every-reference CTE expansion, ~4^n plan subtrees
    — 117 s for 5 rounds over 20 cells, measured).  The final readout
    executes :func:`sql_reweight_select` verbatim over the literal cells
    + final weights, so the output spelling (the ``floor(total·w)``
    budget) stays the oracle's.  An empty cell frame returns an empty
    result frame (the pre-r10 temp-view behavior; r10 raised
    ZeroDivisionError — r10 ADVICE item 2)."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    # |domains| rows of bounded model state — the one driver crossing
    rows = cells.select("domain", "n_docs", "mean_loss").collect()
    if not rows:
        return spark.createDataFrame(
            [],
            "source string, n_docs bigint, mean_loss double, "
            "weight double, token_budget bigint",
        )
    cell_rows = [(r["domain"], float(r["mean_loss"])) for r in rows]
    # round 0: 1/k uniform — IEEE double division, identical in Python
    # and the engine (_sql_init divides the same two exact values)
    w_map = {
        r["r"]["domain"]: float(r["r"]["w"])
        for r in spark.sql(
            _sql_fold_chain_query(
                cell_rows, 1.0 / float(len(rows)), eta, 7, n_rounds
            )
        ).collect()
    }
    cells_rel = (
        "(SELECT col1 AS domain, col2 AS n_docs, col3 AS mean_loss FROM"
        " (VALUES "
        + ", ".join(
            f"({_sql_str(r['domain'])}, CAST({int(r['n_docs'])} AS BIGINT),"
            f" {_sql_double(float(r['mean_loss']))})"
            for r in rows
        )
        + "))"
    )
    w_rel = (
        "(SELECT col1 AS domain, col2 AS w FROM (VALUES "
        + ", ".join(
            f"({_sql_str(d)}, {_sql_double(w)})" for d, w in sorted(w_map.items())
        )
        + "))"
    )
    return spark.sql(
        f"WITH rw{n_rounds} AS (SELECT * FROM {w_rel} fin)\n"
        + sql_reweight_select(cells_rel, n_rounds, total_budget)
    )
