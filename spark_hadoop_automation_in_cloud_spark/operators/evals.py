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

    Groups with no positives or no negatives drop (AUC undefined; both
    engines filter identically).  Output: group_cols..., n_pos, n_neg
    (bigint), auc (double, 6dp).
    """
    gs = list(group_cols)
    lab = F.col(label_col).cast("int")
    counts = (
        df.where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
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
  WHERE ({score_expr}) IS NOT NULL AND ({label_expr}) IS NOT NULL
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
        df.where(s.isNotNull() & F.col(label_col).isNotNull())
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
  WHERE ({score_expr}) IS NOT NULL AND ({label_expr}) IS NOT NULL
)
GROUP BY {gp}bin
"""
