"""Data-quality profiling: per-column health metrics in ONE aggregation
pass — the pipeline guardrail layer the reference lacks entirely (its only
defenses are scattered ``isNotNull`` filters, SURVEY §1.2).

Every metric is a conditional aggregate over the same scan, so profiling N
columns costs one job with map-side partial aggregation — at 100 TB this is
the same single-pass shape as any grouped count, not N table scans.  The
output is a tall (column, metric, value) frame: append it per run and alert
on deltas (row-count collapse, null-ratio spikes, cardinality drift).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per column: null count, null ratio, distinct count — plus the table
    row count under the pseudo-column ``*``.

    Output: col_name, n_nulls, null_ratio (6dp), n_distinct, n_rows.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.round(F.col(f"__nulls_{c}") / F.col("__n"), 6).alias("null_ratio"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col("__n").alias("n_rows"),
            )
            for c in columns
        ]
    )
    return row.select(F.explode(per_col).alias("m")).select("m.*")


def distribution_drift_tv(
    df: DataFrame, bucket_col: str, cat_col: str
) -> DataFrame:
    """Per-bucket categorical drift vs the EARLIEST bucket, as total-
    variation distance — the distribution-shift monitor of a data-quality
    dashboard (did this week's event mix move away from the baseline?).

    TV = ½ Σ_cat |p_cat − q_cat| is computed ENTIRELY in integer
    arithmetic before one final division: with c = bucket count, N =
    bucket total, d = baseline count, M = baseline total,

        TV = Σ |c·M − d·N| / (2·N·M)

    so unlike a PSI/KL score there is no per-category log whose libm
    rounding could diverge across engines, and the Σ runs in exact
    DECIMAL(38,0) — the products reach count·total, which overflows a
    silent-wrapping int64 once both pass ~3e9 rows (a real bucket size at
    the 100 TB target), while decimal stays exact to 1e38 on both
    engines.  Order-independent, bit-identical in the DuckDB oracle.
    Categories missing from either side enter with count 0 (the grid is
    buckets × all categories).

    Scale shape: the input shuffles ONCE into (bucket, cat) counts;
    everything after — totals, the baseline slice, the bucket×category
    grid and its joins — operates on aggregate-sized frames (|buckets| ·
    |categories| rows).  Output: ``bucket_col``, n_rows (bucket size),
    tv_drift (round 6dp; the baseline bucket itself scores 0).

    ``cat_col`` must be non-null: a NULL category counts toward n_rows
    but its mass cannot re-enter through the equi-joined grid (NULL never
    equi-matches — identically on both engines, so parity would hide the
    silent drop).  Coalesce NULLs to a sentinel category, or filter them,
    before calling.
    """
    counts = df.groupBy(bucket_col, cat_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    totals = counts.groupBy(bucket_col).agg(F.sum("c").alias("n_rows"))
    base_b = counts.agg(F.min(bucket_col).alias("__bb"))
    base = (
        counts.join(F.broadcast(base_b), F.col(bucket_col) == F.col("__bb"))
        .select(F.col(cat_col).alias("__cat"), F.col("c").alias("d"))
    )
    base_total = base.agg(F.sum("d").alias("m_rows"))
    grid = totals.crossJoin(counts.select(cat_col).distinct())
    g = (
        grid.join(counts, [bucket_col, cat_col], "left")
        .join(F.broadcast(base), F.col(cat_col) == F.col("__cat"), "left")
        .crossJoin(F.broadcast(base_total))
    )
    dec = "decimal(38,0)"
    term = F.abs(
        F.coalesce(F.col("c"), F.lit(0)).cast(dec) * F.col("m_rows")
        - F.coalesce(F.col("d"), F.lit(0)).cast(dec) * F.col("n_rows")
    )
    return (
        g.groupBy(bucket_col, "n_rows", "m_rows")
        .agg(F.sum(term).alias("__num"))
        .select(
            bucket_col,
            F.col("n_rows"),
            F.round(
                F.col("__num").cast("double")
                / (F.lit(2.0) * F.col("n_rows") * F.col("m_rows")),
                6,
            ).alias("tv_drift"),
        )
    )


def sql_distribution_drift_tv(src: str, bucket_expr: str, cat_col: str, bucket_out: str) -> str:
    """DuckDB oracle twin of :func:`distribution_drift_tv` — identical
    integer numerator, identical final division and rounding."""
    return f"""
WITH rows_ AS (SELECT {bucket_expr} AS b, {cat_col} AS cat FROM {src}),
counts AS (SELECT b, cat, CAST(COUNT(*) AS BIGINT) AS c FROM rows_ GROUP BY 1, 2),
totals AS (SELECT b, CAST(SUM(c) AS BIGINT) AS n_rows FROM counts GROUP BY 1),
bb AS (SELECT MIN(b) AS bb FROM counts),
base AS (SELECT cat, c AS d FROM counts, bb WHERE b = bb),
mt AS (SELECT CAST(SUM(d) AS BIGINT) AS m_rows FROM base),
grid AS (SELECT t.b, t.n_rows, cats.cat
         FROM totals t CROSS JOIN (SELECT DISTINCT cat FROM counts) cats),
g AS (
  SELECT grid.b, grid.n_rows, m.m_rows,
         ABS(CAST(COALESCE(c.c, 0) AS DECIMAL(38,0)) * m.m_rows
             - CAST(COALESCE(ba.d, 0) AS DECIMAL(38,0)) * grid.n_rows)
           AS term
  FROM grid
  LEFT JOIN counts c ON c.b = grid.b AND c.cat = grid.cat
  LEFT JOIN base ba ON ba.cat = grid.cat
  CROSS JOIN mt m
)
SELECT b AS {bucket_out}, n_rows,
       round(CAST(SUM(term) AS DOUBLE) / (2.0 * n_rows * m_rows), 6) AS tv_drift
FROM g GROUP BY b, n_rows, m_rows
"""
