"""Skew-safe equi-join via deterministic key salting.

The hot-key problem: an equi-join shuffles both sides on the key, so one
pathological key (a bot user, a default id, an empty-string sentinel) lands
its entire row set in ONE reduce task — at 100 TB that task runs for hours
while 999 executors idle.  AQE's skew-join split handles the *sorted
merge* case at runtime, but only after the skewed shuffle blocks exist;
salting removes the hot partition *before* the shuffle by widening the key
space:

- the FACT side gets a deterministic salt in ``[0, n_salts)`` derived from
  its own columns (never ``rand()`` — results must be reproducible and
  retry-stable: a task retry that re-rolls salts would double-count rows);
- the DIM side is replicated ``n_salts`` times via ``explode(sequence())``;
- the join runs on ``(key, salt)``, splitting each hot key across
  ``n_salts`` reduce tasks.

Replication multiplies the dim shuffle volume by ``n_salts``, so this sits
between broadcast (dim fits in memory — no shuffle at all) and a plain
shuffle join (no skew): a mid-sized dim and a skewed fact key.  The output
is row-identical to the unsalted join — salting is a physical rewrite, not
a semantic one — which is what the q87 oracle checks.

Dim-preserving joins (``right``/``full`` outer) need one extra step: a dim
row whose key has no fact match — or whose fact matches all hash to OTHER
salt values — would surface null-extended once per replica.  So those
modes run the fact-preserving salted join first and UNION the unmatched
dim rows (null-extended) after, where "matched" is decided by a distinct
over the fact keys.  That distinct is itself skew-safe: Spark's partial
hash aggregate collapses a hot key to one row per map task *before* the
exchange, so no reduce task ever sees the hot key's full row set.

Reference parity: the reference joins events to user dims with no skew
handling at all (``src/spark/collector.py`` equi-joins); this operator is
part of the scale extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    fact_salt: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on equi-key ``on``, salted ``n_salts`` ways.

    ``fact_salt`` must be a deterministic integer expression over fact
    columns (e.g. ``F.pmod(F.col("l_linenumber") * 31 + F.col("l_orderkey"),
    8)``); it is reduced mod ``n_salts`` here so callers can pass any int.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how in ("right", "right_outer", "rightouter", "full", "full_outer", "fullouter", "outer"):
        # dim-preserving modes: replicated dim rows can't be null-extended
        # directly (each unmatched replica would surface once), so run the
        # fact-preserving part salted and append the unmatched dim rows
        inner_how = "left" if how in ("full", "full_outer", "fullouter", "outer") else "inner"
        base = salted_join(fact, dim, on, fact_salt, n_salts, inner_how)
        # distinct is safe on the hot key: partial aggregation collapses it
        # map-side, so the exchange carries <=1 row per key per map task
        matched_keys = fact.select(*on).distinct()
        unmatched_dim = dim.join(matched_keys, on, "left_anti")
        # unionByName null-extends the missing fact columns; column order
        # and widened nullability follow the base frame
        return base.unionByName(unmatched_dim, allowMissingColumns=True)
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join does not support how={how!r}")
    # coalesce: a null-evaluating salt expression (nullable input column)
    # would never equi-match the dim replicas' 0..n-1 salts, silently
    # dropping those fact rows from the join
    f = fact.withColumn(
        SALT,
        F.coalesce(F.pmod(fact_salt.cast("bigint"), F.lit(n_salts)), F.lit(0)),
    )
    d = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return f.join(d, on + [SALT], how).drop(SALT)
