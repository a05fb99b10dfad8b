"""Deterministic sampling and split assignment.

Training-data pipelines need reproducible subsets: a balanced per-stratum
sample for eval sets and ablations, and train/val/test assignment that is
stable across runs, engines, and partitionings.  Both are built on the
repo's portable md5 hash idiom (functions/hashing.py) instead of RNG
state, so two engines — or two runs of one engine — always agree.

Reference parity: the reference engine has no sampling surface at all
(SURVEY §2 lists none); these are pipeline extensions in the same class
as the dedup/similarity operators.

Scale design (the reason this module exists instead of one window):
``stratified_sample`` must not sort the corpus.  The naive form —
``row_number() OVER (PARTITION BY stratum ORDER BY hash) <= k`` — is
less naive than it looks on Spark >= 3.5: the optimizer inserts a
WindowGroupLimit pair, so each map task full-sorts ITS partition
(payloads included) and forwards only k rows per stratum per task, and
no single task ever holds a whole stratum.  What remains corpus-
proportional in that plan is the map-side sort itself — every row,
however wide, goes through an n-log-n comparison sort before the limit
can drop it — and the exchange still grows with the task count
(k * strata * tasks rows; 100k map tasks at 100 TB is 10^8+ shuffled
payloads for k=100).  Because the sample key is a uniform hash, the k
smallest keys of a stratum lie below ``k_eff / n`` of the key range
with overwhelming probability, so the shipped plan is
oversample-then-trim:

1. one tiny aggregate (stratum -> row count) broadcast back,
2. a row-local filter ``key < cutoff`` in the scan stage — a branchless
   compare, no sort; non-survivors are dropped where they are read,
3. the exact top-k window runs over the ~``k_eff`` survivors per
   stratum — corpus-size- AND task-count-independent.

Measured against the WindowGroupLimit form on a 90%-skewed synthetic
(tools/sampling_bench.py, SAMPLING.json): 1.4x wall on narrow rows,
2.5x on document-shaped rows, with 10-15x fewer exchange bytes —
identical output.

The result equals the naive form whenever the filter kept at least
min(k, n) rows per stratum, which the default slack makes a certainty
for practical purposes (Chernoff: P[Binomial(n, k_eff/n) < k] <=
exp(-stddevs^2 / 2) ~ 1.5e-8 at the default 6 sigma, per stratum, on
top of a +16 absolute floor for tiny k).  ``assert_exact=True`` turns
that bound into a hard guarantee: it spends one extra pass to compare
per-stratum sample sizes against min(k, n) and raises on any shortfall
(a collect bounded by the number of strata — model-state sized, like
the k-means centroid collect).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_hadoop_automation_in_cloud_spark.functions import hashing

#: exclusive upper bound of the 60-bit sample key (16^15 = 2^60): small
#: enough that ceil(MAX_KEY * p) for p <= 1 always fits a signed BIGINT.
MAX_KEY = 16**15


def sample_key(id_col: Column, salt: str) -> Column:
    """Uniform 60-bit sample key: the pseudo-random order every sampler
    here sorts by.  md5-derived (hashing.md5_prefix_int), so DuckDB
    replays it bit-for-bit — no RNG state, no partitioner dependence."""
    return hashing.md5_prefix_int(id_col, nhex=15, salt=salt)


def sql_sample_key(expr: str, salt: str) -> str:
    return hashing.sql_md5_prefix_int(expr, nhex=15, salt=salt)


def _k_eff(k: int, slack_stddevs: float, slack_abs: int) -> int:
    return k + math.ceil(slack_stddevs * math.sqrt(k)) + slack_abs


def stratified_survivors(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    k: int,
    salt: str = ":strat",
    slack_stddevs: float = 6.0,
    slack_abs: int = 16,
) -> DataFrame:
    """The oversample stage: rows whose sample key falls below the
    per-stratum cutoff ``k_eff / n`` of the key range (everything when
    ``n <= k_eff``).  Exposed separately so tests can pin the scale
    contract — survivor counts stay ~``k_eff`` per stratum no matter how
    large the stratum — without reaching into the sampler's plan.

    Output: the input columns plus ``__skey`` (the sample key) and
    ``__n`` (the stratum's total row count, reused by the exactness
    check).  The join back is null-safe so a NULL stratum value samples
    as its own group, matching GROUP BY / PARTITION BY semantics.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    k_eff = _k_eff(k, slack_stddevs, slack_abs)
    keyed = df.withColumn("__skey", sample_key(F.col(id_col), salt))
    counts = keyed.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("__n"))
    # ratio in double (exact enough: the slack dwarfs any ulp), cutoff back
    # in BIGINT key space; p = 1 -> cutoff = MAX_KEY keeps every key.
    p = F.least(F.lit(1.0), F.lit(float(k_eff)) / F.col("__n"))
    cuts = counts.select(
        *strata_cols, F.col("__n"), F.ceil(F.lit(float(MAX_KEY)) * p).alias("__cutoff")
    )
    # cuts derives from keyed (a self-join by lineage), so disambiguate the
    # strata refs with explicit aliases; the join is null-safe on purpose —
    # a NULL stratum is one group, matching GROUP BY / PARTITION BY.
    left, right = keyed.alias("__samp_l"), F.broadcast(cuts).alias("__samp_r")
    cond = None
    for c in strata_cols:
        clause = F.col(f"__samp_l.{c}").eqNullSafe(F.col(f"__samp_r.{c}"))
        cond = clause if cond is None else cond & clause
    return (
        left.join(right, cond)
        .where(F.col("__skey") < F.col("__cutoff"))
        .select("__samp_l.*", F.col("__samp_r.__n").alias("__n"))
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    k: int,
    salt: str = ":strat",
    slack_stddevs: float = 6.0,
    slack_abs: int = 16,
    assert_exact: bool = False,
) -> DataFrame:
    """Deterministic exact-k-per-stratum sample in hash order.

    Equivalent to ``row_number() OVER (PARTITION BY strata ORDER BY
    sample_key, id) <= k`` (the spec the DuckDB oracle runs verbatim),
    but the window only ever sees the ~``k_eff`` survivors per stratum
    from :func:`stratified_survivors` — the per-partition full sort the
    window form pays (even with Spark's WindowGroupLimit pushdown; see
    the module docstring) never happens, and the exchange carries
    ~k_eff rows per stratum total instead of k per stratum per map
    task, so a terabyte stratum costs the same shuffle as a megabyte
    one.

    ``assert_exact`` replays the tiny per-stratum accounting and raises
    ``ValueError`` if any stratum sampled fewer than min(k, n) rows —
    impossible under the default slack in any practical sense (see the
    module docstring's bound), but the check converts "astronomically
    unlikely" into "checked", at the cost of one extra scan.  Negative
    slack values are permitted precisely so tests can force that path.

    Output: ``strata_cols + [id_col, sample_rank]`` with ``sample_rank``
    in 1..k dense per stratum, INT like ``row_number`` on both engines.

    Contract: ``id_col`` must be a NON-NULL unique key (the same rule as
    every ranking tiebreaker in this repo) — a NULL id has no sample key,
    cannot be ranked deterministically, and is dropped by the survivor
    filter; engines disagree on NULL sort placement (Spark ASC = NULLS
    FIRST, DuckDB = NULLS LAST), so admitting them would diverge the
    naive spec itself.  NULL *stratum* values are fine (one group, see
    :func:`stratified_survivors`).
    """
    surv = stratified_survivors(
        df, strata_cols, id_col, k, salt, slack_stddevs, slack_abs
    )
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("__skey").asc(), F.col(id_col).asc()
    )
    ranked = (
        surv.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
    )
    if assert_exact:
        # account from the FULL per-stratum counts, not the ranked output:
        # a stratum whose cutoff admitted zero survivors vanishes from
        # ranked entirely, and grouping ranked alone would silently pass
        # exactly the shortfall this flag exists to catch
        # F.count(col) skips NULLs: a NULL-id row is unrankable and dropped
        # by design (see the contract above), so it must not inflate the
        # expected sample size into a spurious undershoot
        expect = df.groupBy(*strata_cols).agg(
            F.least(F.lit(k), F.count(F.col(id_col))).alias("want")
        ).alias("__chk_e")
        got_counts = ranked.groupBy(*strata_cols).agg(
            F.count(F.lit(1)).alias("got")
        ).alias("__chk_g")
        cond = None
        for c in strata_cols:
            clause = F.col(f"__chk_e.{c}").eqNullSafe(F.col(f"__chk_g.{c}"))
            cond = clause if cond is None else cond & clause
        short_rows = (
            expect.join(got_counts, cond, "left")
            .where(F.coalesce(F.col("got"), F.lit(0)) < F.col("want"))
            .select(*[F.col(f"__chk_e.{c}") for c in strata_cols])
            .collect()  # bounded by the number of strata (model state)
        )
        if short_rows:
            short = [tuple(r) for r in short_rows]
            raise ValueError(
                f"stratified_sample undershoot in strata {short}: raise "
                "slack_stddevs/slack_abs (the cutoff admitted fewer than "
                "min(k, n) rows)"
            )
    return ranked.select(
        *strata_cols, id_col, F.col("__rank").alias("sample_rank")
    )


def sql_stratified_sample(
    table: str, strata_cols: list[str], id_col: str, k: int, salt: str = ":strat"
) -> str:
    """DuckDB spec of :func:`stratified_sample`: the NAIVE full-window
    form on purpose — the oracle states what the answer is; that the
    oversample-trim plan reaches the same rows is exactly what the
    cross-engine hash check proves."""
    strata = ", ".join(strata_cols)
    key = sql_sample_key(id_col, salt)
    return f"""
WITH ranked AS (
  SELECT {strata}, {id_col},
         CAST(ROW_NUMBER() OVER (
           PARTITION BY {strata} ORDER BY {key}, {id_col}
         ) AS INTEGER) AS sample_rank
  FROM {table}
)
SELECT {strata}, {id_col}, sample_rank FROM ranked WHERE sample_rank <= {k}
"""


_SPLIT_NAME = re.compile(r"^[A-Za-z0-9_.-]+$")


def _check_splits(splits: list[tuple[str, int]]) -> None:
    if len(splits) < 2:
        raise ValueError("need at least two splits")
    if any(pct <= 0 for _, pct in splits):
        raise ValueError(f"split percents must be positive: {splits}")
    total = sum(pct for _, pct in splits)
    if total != 100:
        raise ValueError(f"split percents must sum to 100, got {total}")
    # names land inside single-quoted SQL literals in the DuckDB twin; a
    # quote would break (or inject into) the oracle while the Column API
    # twin sails on — the same cross-engine divergence class the salt
    # check in functions/hashing.py guards, closed the same way
    bad = [n for n, _ in splits if not _SPLIT_NAME.match(n)]
    if bad:
        raise ValueError(f"split names must match {_SPLIT_NAME.pattern}: {bad}")
    if len({n for n, _ in splits}) != len(splits):
        raise ValueError(f"split names must be distinct: {splits}")


def hash_split(key_col: Column, splits: list[tuple[str, int]], salt: str) -> Column:
    """Deterministic split label from a key hash: ``splits`` is an ordered
    ``[(name, percent)]`` list summing to 100; the key's md5 bucket in
    0..99 walks the cumulative thresholds (the q42 train/val/test idiom,
    generalized).  Pure row-local projection — computable in the scan
    stage of a 100 TB read, and stable across runs and engines because
    the bucket is content-free md5, not RNG.

    A NULL key hashes to a NULL bucket, every ``< threshold`` arm is
    false, and the row falls through to the LAST split's label — on BOTH
    engines (Spark ``otherwise`` == SQL ``ELSE``; pytest-pinned).  Key
    columns are normally non-null ids, but the fallthrough is defined
    rather than accidental."""
    _check_splits(splits)
    bucket = hashing.md5_prefix_int(key_col, nhex=8, salt=salt) % 100
    expr = None
    acc = 0
    for name, pct in splits[:-1]:
        acc += pct
        expr = (
            F.when(bucket < acc, name)
            if expr is None
            else expr.when(bucket < acc, name)
        )
    return expr.otherwise(splits[-1][0])


def sql_hash_split(expr: str, splits: list[tuple[str, int]], salt: str) -> str:
    """DuckDB twin of :func:`hash_split` (same buckets, same thresholds)."""
    _check_splits(splits)
    bucket = f"({hashing.sql_md5_prefix_int(expr, nhex=8, salt=salt)} % 100)"
    acc = 0
    arms = []
    for name, pct in splits[:-1]:
        acc += pct
        arms.append(f"WHEN {bucket} < {acc} THEN '{name}'")
    return f"CASE {' '.join(arms)} ELSE '{splits[-1][0]}' END"
