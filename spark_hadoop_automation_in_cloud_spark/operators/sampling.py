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


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (ticket lottery)
# ---------------------------------------------------------------------------
#
# Quality-weighted subset selection — "sample k docs per language,
# preferring high quality but not deterministically top-k" — is the
# probabilistic sibling of token_budget_selection's best-first cut (q112):
# best-first maximizes quality but collapses diversity; a weighted sample
# keeps the long tail reachable at a rate you control.
#
# The textbook scheme (Efraimidis-Spirakis: rank by u^(1/w)) needs ln/pow
# over doubles, and cross-engine float ordering is exactly the hazard this
# repo's integer-hash idiom exists to avoid: two rows whose keys differ in
# the last ulp could RANK differently on Spark vs DuckDB, flipping the
# sampled set at the k boundary.  So the key here is integer-exact: each
# row holds ``tickets`` (an integer weight, 1..max_tickets) independent
# md5 draws, and its sample key is the MINIMUM draw.  More tickets →
# stochastically smaller minimum → more likely in the k smallest keys;
# for k << n the inclusion probability is ~proportional to tickets
# (P[min < c] = 1-(1-c/M)^w ≈ w·c/M), and both engines replay the exact
# same 60-bit integers — no transcendentals anywhere.
#
# The oversample-trim scale shape generalizes: expected survivors below a
# cutoff c are ~(c/M)·W for W = stratum ticket SUM, so the row-local
# pre-filter cutoff is k_eff·M/W — one tiny aggregate, broadcast, then a
# branchless compare in the scan, exactly like stratified_survivors with
# the ticket sum standing in for the row count.


def weighted_ticket_key(
    id_col: Column, tickets: Column, max_tickets: int, salt: str
) -> Column:
    """Integer sample key: min of ``tickets`` independent md5 draws (of
    ``max_tickets`` precomputed).  Tickets are clamped into
    [1, max_tickets] row-locally — out-of-range weights degrade to the
    nearest valid lottery rather than corrupting the draw (documented
    loudly: the CLAMPED value is the effective weight)."""
    if not 1 <= max_tickets <= 64:
        raise ValueError(f"max_tickets must be in [1, 64], got {max_tickets}")
    draws = F.array(
        *[
            hashing.md5_prefix_int(id_col, nhex=15, salt=f"{salt}#{r}")
            for r in range(1, max_tickets + 1)
        ]
    )
    # coalesce BEFORE the clamp: Spark's least/greatest skip NULL args
    # (least(NULL, 10) = 10), so a NULL ticket count would silently clamp
    # to max_tickets — and engines disagree on NULL propagation here, so
    # the explicit coalesce-to-1 is the only portable reading
    t = F.greatest(
        F.lit(1),
        F.least(F.coalesce(tickets.cast("int"), F.lit(1)), F.lit(max_tickets)),
    )
    return F.array_min(F.slice(draws, 1, t))


def sql_weighted_ticket_key(
    id_expr: str, tickets_expr: str, max_tickets: int, salt: str
) -> str:
    """DuckDB twin of :func:`weighted_ticket_key` — identical integers."""
    draws = ", ".join(
        hashing.sql_md5_prefix_int(id_expr, nhex=15, salt=f"{salt}#{r}")
        for r in range(1, max_tickets + 1)
    )
    t = (
        f"GREATEST(1, LEAST(COALESCE(CAST({tickets_expr} AS INT), 1), "
        f"{max_tickets}))"
    )
    return f"list_min(([{draws}])[1:{t}])"


def weighted_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    tickets_col: str,
    k: int,
    max_tickets: int = 16,
    salt: str = ":wsamp",
    slack_stddevs: float = 6.0,
    slack_abs: int = 16,
) -> DataFrame:
    """Deterministic weighted k-per-stratum sample (ticket lottery).

    Equivalent to ``row_number() OVER (PARTITION BY strata ORDER BY
    weighted_ticket_key, id) <= k`` (the spec the DuckDB oracle runs
    verbatim), but scaled like :func:`stratified_sample`: a per-stratum
    TICKET-SUM aggregate sets the row-local cutoff ``k_eff·M/W``, the
    scan drops non-survivors branchlessly, and the exact window runs
    over ~``k_eff`` survivors per stratum — corpus-size- and
    task-count-independent.  (The concavity of 1-(1-c/M)^w only ever
    makes the survivor count UNDERSHOOT its ~k_eff mean by a
    second-order term ~k_eff²·max_tickets/(2W); the additive slack
    floor covers it at any stratum size where the cutoff is below 1.0
    — at small W the cutoff saturates and every row survives, making
    the trim exact by construction.)

    Output: ``strata_cols + [id_col, tickets_col, sample_rank]``.
    Same NULL contract as :func:`stratified_sample`: NULL ids are
    dropped (unrankable), NULL strata form one group.  NULL tickets
    clamp to 1 (the minimum lottery).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    k_eff = _k_eff(k, slack_stddevs, slack_abs)
    t_eff = F.greatest(
        F.lit(1),
        F.least(
            F.coalesce(F.col(tickets_col).cast("int"), F.lit(1)),
            F.lit(max_tickets),
        ),
    )
    # NULL ids are out of the draw ENTIRELY — dropped here, before the
    # ticket sum: an unrankable row must not contribute ticket mass to
    # W either, or a stratum heavy in NULL-id rows gets a deflated
    # cutoff and silently returns fewer than k valid rows (diverging
    # from the naive-window spec, which never sees those rows)
    df = df.where(F.col(id_col).isNotNull())
    keyed = df.withColumn(
        "__wkey", weighted_ticket_key(F.col(id_col), F.col(tickets_col), max_tickets, salt)
    ).withColumn("__t_eff", t_eff)
    sums = keyed.groupBy(*strata_cols).agg(F.sum("__t_eff").alias("__w"))
    p = F.least(F.lit(1.0), F.lit(float(k_eff)) / F.col("__w"))
    cuts = sums.select(
        *strata_cols, F.ceil(F.lit(float(MAX_KEY)) * p).alias("__cutoff")
    )
    left, right = keyed.alias("__ws_l"), F.broadcast(cuts).alias("__ws_r")
    cond = None
    for c in strata_cols:
        clause = F.col(f"__ws_l.{c}").eqNullSafe(F.col(f"__ws_r.{c}"))
        cond = clause if cond is None else cond & clause
    surv = left.join(right, cond).where(F.col("__wkey") < F.col("__cutoff"))
    w = Window.partitionBy(*[F.col(f"__ws_l.{c}") for c in strata_cols]).orderBy(
        F.col("__wkey").asc(), F.col(f"__ws_l.{id_col}").asc()
    )
    return (
        surv.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
        .select(
            *[F.col(f"__ws_l.{c}") for c in strata_cols],
            F.col(f"__ws_l.{id_col}"),
            F.col(f"__ws_l.{tickets_col}"),
            F.col("__rank").cast("int").alias("sample_rank"),
        )
    )


def sql_weighted_sample(
    table: str,
    strata_cols: list[str],
    id_col: str,
    tickets_expr: str,
    tickets_alias: str,
    k: int,
    max_tickets: int = 16,
    salt: str = ":wsamp",
) -> str:
    """DuckDB spec of :func:`weighted_sample`: the NAIVE full-window form
    on purpose (same stance as :func:`sql_stratified_sample`)."""
    strata = ", ".join(strata_cols)
    key = sql_weighted_ticket_key(id_col, tickets_expr, max_tickets, salt)
    return f"""
WITH ranked AS (
  SELECT {strata}, {id_col}, {tickets_expr} AS {tickets_alias},
         CAST(ROW_NUMBER() OVER (
           PARTITION BY {strata} ORDER BY {key}, {id_col}
         ) AS INTEGER) AS sample_rank
  FROM {table}
)
SELECT {strata}, {id_col}, {tickets_alias}, sample_rank
FROM ranked WHERE sample_rank <= {k}
"""


def correlated_sample(
    root: DataFrame,
    key_col: str,
    children: dict[str, tuple[DataFrame, str]],
    rate_num: int = 1,
    rate_den: int = 10,
    salt: str = ":corr",
) -> dict[str, DataFrame]:
    """Referential-integrity-preserving sampling: hash-gate the ROOT
    entity (keep keys whose 60-bit sample key falls in the lowest
    ``rate_num/rate_den`` slice) and keep EVERY child row belonging to
    a kept root — the dev-dataset cut that row-independent sampling
    cannot give (independent 10% samples of customers and their orders
    share ~1% of joinable pairs; this keeps 10% of customers WITH 100%
    of their orders, so every downstream join still works).

    ``children`` maps a name to (DataFrame, fk_col).  The gate is
    row-local on the root (the :func:`sample_key` md5 slice — no RNG
    state, replayable on any engine); children filter by semi-join on
    the kept keys (shuffle on the FK — at 100 TB the kept-key side is
    rate × |roots| and broadcast-eligible at practical rates).

    Deterministic: same salt → same sample, run over run — the property
    a refreshable dev snapshot needs.  Returns ``{"root": kept_root,
    **{name: kept_child}}``.
    """
    dec = "decimal(38,0)"
    gate = sample_key(F.col(key_col), salt).cast(dec) * rate_den < F.lit(
        rate_num
    ).cast(dec) * F.lit(1 << 60).cast(dec)
    kept_root = root.where(gate)
    keys = kept_root.select(key_col).distinct()
    out = {"root": kept_root}
    for name, (child, fk) in children.items():
        out[name] = child.join(
            keys.select(F.col(key_col).alias(fk)), fk, "left_semi"
        )
    return out


def sql_correlated_sample_counts(
    root_src: str,
    key_expr: str,
    children: dict[str, tuple[str, str]],
    rate_num: int = 1,
    rate_den: int = 10,
    salt: str = ":corr",
) -> str:
    """DuckDB twin of the :func:`correlated_sample` AUDIT frame (one row
    per table: kept/total counts and the kept share) — children given
    as ``{name: (src_sql, fk_expr)}``."""
    gate = (
        f"CAST({sql_sample_key(key_expr, salt)} AS HUGEINT) * {rate_den} "
        f"< {rate_num} * (CAST(1 AS HUGEINT) << 60)"
    )
    parts = [
        f"""
SELECT 'root' AS tbl,
       CAST(SUM(CASE WHEN {gate} THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(COUNT(*) AS BIGINT) AS total
FROM ({root_src})"""
    ]
    keys = f"SELECT {key_expr} AS k FROM ({root_src}) WHERE {gate}"
    for name, (src, fk) in children.items():
        parts.append(
            f"""
SELECT '{name}' AS tbl,
       CAST(SUM(CASE WHEN {fk} IN ({keys}) THEN 1 ELSE 0 END) AS BIGINT)
         AS kept,
       CAST(COUNT(*) AS BIGINT) AS total
FROM ({src})"""
        )
    u = "\nUNION ALL\n".join(parts)
    return f"""
SELECT tbl, kept, total,
       round(CAST(kept AS DOUBLE) / total, 6) AS kept_share
FROM ({u}) ORDER BY tbl
"""
