"""Classifier evaluation over corpus-scale score columns: exact ROC-AUC
by rank statistics and calibration reliability bins.

The curation pipeline is full of scores that gate data (quality q27, LM
fluency q101/q141, rule bundles q154); before any of them is trusted to
keep or drop 100 TB of documents, two questions must be answered against
a labeled slice: does the score RANK positives above negatives (AUC),
and do its VALUES mean what they claim (calibration)?  q148's confusion
matrix answers these only at one threshold; these operators answer them
across all thresholds at once.

Both follow the aggregate-first discipline of the KS/PSI drift family
(operators/checks.py): the corpus collapses to per-(group, distinct
score) counts in ONE map-side-combined shuffle, and every window runs
over that tiny frame, partitioned per group — nothing corpus-sized is
ever sorted globally and nothing runs single-partition.  All arithmetic
that must match the DuckDB twin is integer-exact: scores snap to the
1e-6 grid BEFORE grouping, pair counts multiply as DECIMAL(38,0), and
one final division produces each double.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: scores snap to this grid before any grouping / averaging — exact
#: integer arithmetic from there on, bit-identical across engines
SCORE_GRID = 1_000_000


def _score_key(score: Column) -> Column:
    return F.round(score * SCORE_GRID).cast("bigint")


def roc_auc(
    df: DataFrame,
    group_cols: Sequence[str],
    label_col: str,
    score_col: str,
) -> DataFrame:
    """EXACT ROC-AUC of ``score_col`` predicting boolean/0-1
    ``label_col``, per group — the Mann-Whitney rank-sum form: the
    probability a random positive outscores a random negative, ties at
    half credit,

        AUC = Σ_s [ pos_s · (2·neg_below_s + neg_s) ] / (2·P·N)

    summed over distinct score values ``s``.  The numerator is exact:
    integer counts on the 1e-6 score grid, products in DECIMAL(38,0),
    ONE final division — order-independent and engine-identical (the
    q155 KS convention).

    Scale shape: one shuffle into (group, score) conditional counts
    (ties collapse at the map-side combiner — the frame is |distinct
    scores| per group, NOT corpus-sized); the strictly-below cumulative
    and the group totals are two chained Window specs over that single
    partitioning (the q140/q155 grouped-window idiom — groups
    parallelize).  No global sort, no per-row ranks over the corpus.

    NULL and NaN scores drop (NaN passes isNotNull, and the engines
    disagree on casting it to the integer grid — Spark maps to 0,
    DuckDB raises).  Groups with no positives or no negatives drop
    (AUC undefined; both engines filter identically).  Output: group_cols..., n_pos, n_neg
    (bigint), auc (double, 6dp).
    """
    gs = list(group_cols)
    lab = F.col(label_col).cast("int")
    counts = (
        df.where(
            F.col(score_col).isNotNull()
            & ~F.isnan(F.col(score_col).cast("double"))
            & F.col(label_col).isNotNull()
        )
        .groupBy(*gs, _score_key(F.col(score_col)).alias("__s"))
        .agg(
            F.sum(lab).cast("bigint").alias("pos"),
            F.sum(1 - lab).cast("bigint").alias("neg"),
        )
    )
    dec = "decimal(38,0)"
    below = (
        Window.partitionBy(*gs)
        .orderBy(F.col("__s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tw = Window.partitionBy(*gs)
    cum = counts.select(
        *gs,
        F.col("pos").cast(dec).alias("pos"),
        F.col("neg").cast(dec).alias("neg"),
        F.coalesce(F.sum("neg").over(below), F.lit(0)).cast(dec).alias("neg_below"),
        F.sum("pos").over(tw).cast(dec).alias("n_pos"),
        F.sum("neg").over(tw).cast(dec).alias("n_neg"),
    )
    term = F.col("pos") * (F.lit(2).cast(dec) * F.col("neg_below") + F.col("neg"))
    return (
        cum.where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .groupBy(*gs, "n_pos", "n_neg")
        .agg(F.sum(term).alias("__num2"))
        .select(
            *gs,
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.col("n_neg").cast("bigint").alias("n_neg"),
            F.round(
                F.col("__num2").cast("double")
                / (
                    2.0
                    * F.col("n_pos").cast("double")
                    * F.col("n_neg").cast("double")
                ),
                6,
            ).alias("auc"),
        )
    )


def sql_roc_auc(
    src_sql: str,
    group_cols: Sequence[str],
    label_expr: str,
    score_expr: str,
) -> str:
    """DuckDB twin of :func:`roc_auc`: identical grid, conditional
    counts, strictly-below cumulative window, HUGEINT-exact numerator
    and single final division."""
    gs = list(group_cols)
    g = ", ".join(gs)
    gp = f"{g}, " if gs else ""
    part = f"PARTITION BY {g}" if gs else ""
    return f"""
WITH counts AS (
  SELECT {gp}CAST(round(({score_expr}) * {SCORE_GRID}) AS BIGINT) AS s,
         SUM(CAST(({label_expr}) AS INT)) AS pos,
         SUM(1 - CAST(({label_expr}) AS INT)) AS neg
  FROM ({src_sql})
  WHERE ({score_expr}) IS NOT NULL
        AND NOT isnan(CAST(({score_expr}) AS DOUBLE))
        AND ({label_expr}) IS NOT NULL
  GROUP BY {gp}s
),
cum AS (
  SELECT {gp}CAST(pos AS HUGEINT) AS pos, CAST(neg AS HUGEINT) AS neg,
         CAST(COALESCE(SUM(neg) OVER ({part} ORDER BY s ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS HUGEINT) AS neg_below,
         CAST(SUM(pos) OVER ({part}) AS HUGEINT) AS n_pos,
         CAST(SUM(neg) OVER ({part}) AS HUGEINT) AS n_neg
  FROM counts
)
SELECT {gp}CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       round(CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
             / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) AS auc
FROM cum
WHERE n_pos > 0 AND n_neg > 0
GROUP BY {gp}n_pos, n_neg
"""


def calibration_bins(
    df: DataFrame,
    group_cols: Sequence[str],
    label_col: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram: ``score_col`` (expected in [0, 1]) cut into
    ``n_bins`` equal-width bins, and per (group, bin) the empirical
    positive rate next to the mean claimed score — the calibration gap
    AUC cannot see (a perfectly-ranking score can still claim 0.9 where
    only 0.6 of documents are positive, and a threshold chosen from its
    face value would over-admit).

    Scale shape: binning is a row-local projection in the scan; ONE
    map-side-combined aggregation to ≤ groups × n_bins rows.  Mean
    score is exact — scores sum as 1e-6-grid integers (order-
    independent) with one final division; scores outside [0, 1] clamp
    into the edge bins (both engines identically).

    Output: group_cols..., bin (int), bin_lo (double), n, n_pos
    (bigint), frac_pos, mean_score (double, 6dp).
    """
    gs = list(group_cols)
    s = F.col(score_col)
    lab = F.col(label_col).cast("int")
    b = F.least(
        F.greatest(F.floor(s * n_bins).cast("int"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    return (
        df.where(
            s.isNotNull()
            & ~F.isnan(s.cast("double"))
            & F.col(label_col).isNotNull()
        )
        .groupBy(*gs, b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(lab).cast("bigint").alias("n_pos"),
            F.sum(_score_key(s)).cast("bigint").alias("__ssum"),
        )
        .select(
            *gs,
            "bin",
            F.round(F.col("bin").cast("double") / n_bins, 6).alias("bin_lo"),
            "n",
            "n_pos",
            F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias("frac_pos"),
            F.round(
                F.col("__ssum").cast("double") / SCORE_GRID / F.col("n"), 6
            ).alias("mean_score"),
        )
    )


def sql_calibration_bins(
    src_sql: str,
    group_cols: Sequence[str],
    label_expr: str,
    score_expr: str,
    n_bins: int = 10,
) -> str:
    """DuckDB twin of :func:`calibration_bins`: identical clamped bin,
    grid-integer score sum, same rounding."""
    gs = list(group_cols)
    gp = (", ".join(gs) + ", ") if gs else ""
    return f"""
SELECT {gp}bin,
       round(CAST(bin AS DOUBLE) / {n_bins}, 6) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(({label_expr}) AS INT)) AS BIGINT) AS n_pos,
       round(CAST(SUM(CAST(({label_expr}) AS INT)) AS DOUBLE) / COUNT(*), 6)
         AS frac_pos,
       round(CAST(SUM(CAST(round(({score_expr}) * {SCORE_GRID}) AS BIGINT))
                  AS DOUBLE) / {SCORE_GRID} / COUNT(*), 6) AS mean_score
FROM (
  SELECT *, least(greatest(CAST(floor(({score_expr}) * {n_bins}) AS INT), 0),
                  {n_bins - 1}) AS bin
  FROM ({src_sql})
  WHERE ({score_expr}) IS NOT NULL
        AND NOT isnan(CAST(({score_expr}) AS DOUBLE))
        AND ({label_expr}) IS NOT NULL
)
GROUP BY {gp}bin
"""


def cohens_kappa(
    df: DataFrame,
    true_col: str,
    pred_col: str,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two labelings:
    ``(p_o − p_e) / (1 − p_e)`` with observed agreement ``p_o`` and the
    chance agreement ``p_e = Σ_c (row_c · col_c) / N²`` from the
    marginals.  The one-number upgrade of q148's confusion matrix: raw
    accuracy flatters any classifier on a skewed label mix (predicting
    the majority language everywhere scores high); kappa subtracts
    exactly that.

    Scale shape: ONE map-side-combined aggregation to the |labels|²
    confusion cells; marginals and both agreement terms are aggregates
    OF that tiny frame.  All arithmetic is exact integer products in
    DECIMAL(38,0) — ``p_o``, ``p_e``, ``kappa`` come from single double
    divisions of exact numerators (kappa's two divisions share one
    recipe with the SQL twin).  NULL labels drop on both engines.

    Output: one row — n (bigint), p_o, p_e, kappa (double 6dp).
    """
    cells = (
        df.where(F.col(true_col).isNotNull() & F.col(pred_col).isNotNull())
        .groupBy(
            F.col(true_col).alias("__t"), F.col(pred_col).alias("__p")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    dec = "decimal(38,0)"
    rows = cells.groupBy("__t").agg(F.sum("__n").alias("__rn"))
    colns = cells.groupBy("__p").agg(F.sum("__n").alias("__cn"))
    marg = rows.join(colns, rows["__t"] == colns["__p"], "inner").select(
        (F.col("__rn").cast(dec) * F.col("__cn").cast(dec)).alias("__rc")
    )
    stats = cells.agg(
        F.sum("__n").cast(dec).alias("__tot"),
        F.sum(F.when(F.col("__t") == F.col("__p"), F.col("__n")).otherwise(0))
        .cast(dec)
        .alias("__agree"),
    )
    pe_num = marg.agg(F.sum("__rc").alias("__pe_num"))
    out = stats.crossJoin(F.broadcast(pe_num))
    po = F.col("__agree").cast("double") / F.col("__tot").cast("double")
    pe = F.col("__pe_num").cast("double") / (
        F.col("__tot").cast("double") * F.col("__tot").cast("double")
    )
    return out.select(
        F.col("__tot").cast("bigint").alias("n"),
        F.round(po, 6).alias("p_o"),
        F.round(pe, 6).alias("p_e"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


def sql_cohens_kappa(src_sql: str, true_expr: str, pred_expr: str) -> str:
    """DuckDB twin of :func:`cohens_kappa`: identical cells, HUGEINT
    marginal products, and the same division recipe."""
    return f"""
WITH cells AS (
  SELECT ({true_expr}) AS t, ({pred_expr}) AS p, COUNT(*) AS n
  FROM ({src_sql})
  WHERE ({true_expr}) IS NOT NULL AND ({pred_expr}) IS NOT NULL
  GROUP BY 1, 2
),
rows_m AS (SELECT t, SUM(n) AS rn FROM cells GROUP BY t),
cols_m AS (SELECT p, SUM(n) AS cn FROM cells GROUP BY p),
stats AS (
  SELECT CAST(SUM(n) AS HUGEINT) AS tot,
         CAST(SUM(CASE WHEN t = p THEN n ELSE 0 END) AS HUGEINT) AS agree
  FROM cells
),
pe_num AS (
  SELECT CAST(SUM(CAST(r.rn AS HUGEINT) * CAST(c.cn AS HUGEINT)) AS HUGEINT)
           AS pen
  FROM rows_m r JOIN cols_m c ON c.p = r.t
)
SELECT CAST(tot AS BIGINT) AS n,
       round(CAST(agree AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS p_o,
       round(CAST(pen AS DOUBLE)
             / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS p_e,
       round((CAST(agree AS DOUBLE) / CAST(tot AS DOUBLE)
              - CAST(pen AS DOUBLE)
                / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)))
             / (1.0 - CAST(pen AS DOUBLE)
                      / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))), 6)
         AS kappa
FROM stats CROSS JOIN pe_num
"""


def two_proportion_ztest(
    df: DataFrame,
    group_cols: Sequence[str],
    seg_col: str,
    a_label: str,
    b_label: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test per group — the A/B significance primitive:
    is segment A's success rate different from segment B's beyond
    sampling noise?  Pooled form:
    ``z = (p_a − p_b) / sqrt( p·(1−p)·(1/n_a + 1/n_b) )`` with ``p``
    the pooled rate.  The experiment-analysis sibling of the drift
    monitors: PSI/KS ask "did the data change", this asks "did the
    TREATMENT change the data".

    Scale shape: ONE map-side-combined aggregation to per-group
    conditional counts (four exact bigints per group); every division
    happens once, on those exact counts, group-locally.  Groups missing
    either segment drop (no defined rate), as do zero-variance pools
    (p = 0 or 1 — z undefined; both engines filter identically).

    Output: group_cols..., n_a, s_a, n_b, s_b (bigint), p_a, p_b,
    z (double 6dp), significant_95 (int, |z| > 1.96).
    """
    gs = list(group_cols)
    seg = F.col(seg_col)
    suc = F.col(success_col).cast("int")
    agg = (
        df.where(seg.isin(a_label, b_label) & F.col(success_col).isNotNull())
        .groupBy(*gs)
        .agg(
            F.sum(F.when(seg == a_label, 1).otherwise(0)).cast("bigint").alias("n_a"),
            F.sum(F.when(seg == a_label, suc).otherwise(0))
            .cast("bigint")
            .alias("s_a"),
            F.sum(F.when(seg == b_label, 1).otherwise(0)).cast("bigint").alias("n_b"),
            F.sum(F.when(seg == b_label, suc).otherwise(0))
            .cast("bigint")
            .alias("s_b"),
        )
    )
    na, sa = F.col("n_a").cast("double"), F.col("s_a").cast("double")
    nb, sb = F.col("n_b").cast("double"), F.col("s_b").cast("double")
    pa, pb = sa / na, sb / nb
    pool = (sa + sb) / (na + nb)
    z = (pa - pb) / F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    return (
        agg.where(
            (F.col("n_a") > 0)
            & (F.col("n_b") > 0)
            & (F.col("s_a") + F.col("s_b") > 0)
            & (F.col("s_a") + F.col("s_b") < F.col("n_a") + F.col("n_b"))
        )
        .select(
            *gs,
            "n_a",
            "s_a",
            "n_b",
            "s_b",
            F.round(pa, 6).alias("p_a"),
            F.round(pb, 6).alias("p_b"),
            (F.round(z, 6) + F.lit(0.0)).alias("z"),
            F.when(F.abs(z) > 1.96, 1).otherwise(0).alias("significant_95"),
        )
    )


def sql_two_proportion_ztest(
    src_sql: str,
    group_cols: Sequence[str],
    seg_expr: str,
    a_label: str,
    b_label: str,
    success_expr: str,
) -> str:
    """DuckDB twin of :func:`two_proportion_ztest`: identical conditional
    counts and the one shared pooled-z recipe."""
    gs = list(group_cols)
    g = ", ".join(gs)
    gp = f"{g}, " if gs else ""
    return f"""
WITH agg AS (
  SELECT {gp}
         CAST(SUM(CASE WHEN ({seg_expr}) = '{a_label}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN ({seg_expr}) = '{a_label}'
                       THEN CAST(({success_expr}) AS INT) ELSE 0 END)
              AS BIGINT) AS s_a,
         CAST(SUM(CASE WHEN ({seg_expr}) = '{b_label}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN ({seg_expr}) = '{b_label}'
                       THEN CAST(({success_expr}) AS INT) ELSE 0 END)
              AS BIGINT) AS s_b
  FROM ({src_sql})
  WHERE ({seg_expr}) IN ('{a_label}', '{b_label}')
        AND ({success_expr}) IS NOT NULL
  {f"GROUP BY {g}" if gs else ""}
)
SELECT {gp}n_a, s_a, n_b, s_b,
       round(CAST(s_a AS DOUBLE) / n_a, 6) AS p_a,
       round(CAST(s_b AS DOUBLE) / n_b, 6) AS p_b,
       round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
             / sqrt((CAST(s_a + s_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(s_a + s_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) + 0.0 AS z,
       CASE WHEN abs((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
                     / sqrt((CAST(s_a + s_b AS DOUBLE) / (n_a + n_b))
                            * (1.0 - CAST(s_a + s_b AS DOUBLE) / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b))) > 1.96
            THEN 1 ELSE 0 END AS significant_95
FROM agg
WHERE n_a > 0 AND n_b > 0 AND s_a + s_b > 0 AND s_a + s_b < n_a + n_b
"""
