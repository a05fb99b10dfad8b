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
one CTE chain (:func:`sql_reweight_ctes`), Spark executes them ONE ROUND
PER QUERY over the re-materialized |domains|-row weight state
(:func:`exp_gradient_weights`) — the q69/q197 trajectory discipline.
The 7dp per-round snap re-synchronizes the engines' exp/summation ulp
wobble (~k·1e−16 per round, nine orders under the grid).

Why Spark does NOT execute the unrolled chain directly: Spark inlines a
CTE at every reference site (no ``AS MATERIALIZED``), and each round
references the previous round's weights twice and the cell table twice —
so the chained plan grows ~4× per round, 4^n subtrees with their own
exchanges.  Measured: 117 s for 5 rounds over a TWENTY-row cell table as
one query; ~1 s executed round-per-query.  DuckDB has the same inlining
hazard, which is why the oracle chain emits ``AS MATERIALIZED``.

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


def exp_gradient_weights(
    spark,
    cells,
    n_rounds: int = 5,
    eta: float = 0.5,
    total_budget: int = 20_000,
):
    """Run the trajectory IN SPARK over a (domain, n_docs, mean_loss)
    DataFrame — the same per-round SQL fragment the oracle unrolls
    (:func:`_sql_round`), so a spelling drift between the engines is
    impossible by construction.  ONE round per query, with the
    |domains|-row weight state collected and re-materialized between
    rounds (bounded model state — the q96 broadcast-centroid contract):
    executing the unrolled chain as a single query hits Spark's
    inline-at-every-reference CTE expansion, ~4^n plan subtrees
    (117 s for 5 rounds over 20 cells, measured; ~1 s this way)."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    cells.createOrReplaceTempView("reweight_cells")
    w_rows = spark.sql(
        "WITH "
        + ",\n".join(_sql_init("reweight_cells", ""))
        + "\nSELECT domain, w FROM rw0"
    ).collect()
    for i in range(1, n_rounds + 1):
        spark.createDataFrame(
            w_rows, "domain string, w double"
        ).createOrReplaceTempView("rw_prev")
        w_rows = spark.sql(
            "WITH "
            + ",\n".join(_sql_round("reweight_cells", i, "rw_prev", eta, 7, ""))
            + f"\nSELECT domain, w FROM rw{i}"
        ).collect()
    spark.createDataFrame(
        w_rows, "domain string, w double"
    ).createOrReplaceTempView(f"rw{n_rounds}")
    return spark.sql(
        sql_reweight_select("reweight_cells", n_rounds, total_budget)
    )
