"""Arrow-batched custom aggregations (``applyInPandas``) — the §2.10 UDAF
surface for aggregates Spark's built-ins can't express.

The reference has no UDF/UDAF layer at all (SURVEY §2.10: its Python runs
driver-side between Spark jobs); this module is the extension seam showing
HOW a custom aggregate joins the engine: grouped Arrow batches in, one
result row per group out, exact integer math inside so the result is
hash-checkable against any engine.

Design rules for oracle-safe pandas kernels (mirrors streaming/stateful.py):
- integerize doubles BEFORE the kernel (cents), sum as int64 — no float
  accumulation order to diverge;
- derive cut indices with integer division (``n * pct // 100``), never
  ``floor(n * 0.01 * pct)`` float math;
- return the unrounded double and round in Spark — Python's ``round`` is
  banker's, Spark/DuckDB round half-up, and a terminating decimal CAN land
  exactly on the tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_pct: int = 10,
) -> DataFrame:
    """Per-group trimmed mean: drop the lowest and highest ``trim_pct``
    percent of rows (``k = n * trim_pct // 100`` from each end, as a
    multiset — well-defined under ties), average the rest.

    The robust-location statistic built-in aggregates can't express
    (percentile() gives cut POINTS, not the mean between them when
    duplicates straddle the cut).  Runs as one ``applyInPandas`` pass:
    shuffle on the group key, then a vectorized numpy sort+slice+sum per
    group — int64 cents in, exact int64 sum out, so the kernel is engine-
    reproducible.  Per-group data must fit one executor (same contract as
    any grouped-map UDF); for 100 TB groups, pre-aggregate into value
    histograms first and trim on the histogram.

    Output: ``group_col``, n_kept, trimmed_mean (value units, 6dp).
    """
    import pandas as pd

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        v = np.sort(pdf["__v_c"].to_numpy())
        n = len(v)
        k = n * trim_pct // 100
        kept = v[k : n - k]
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_kept": [len(kept)],
                "trimmed_mean": [float(kept.sum()) / len(kept) / 100.0],
            }
        )

    cents = F.round(F.col(value_col) * 100).cast("bigint")
    out = (
        df.select(group_col, cents.alias("__v_c"))
        .groupBy(group_col)
        .applyInPandas(
            kernel, schema=f"{group_col} string, n_kept long, trimmed_mean double"
        )
    )
    return out.select(
        group_col,
        "n_kept",
        F.round("trimmed_mean", 6).alias("trimmed_mean"),
    )


def sql_trimmed_mean(
    src: str, group_col: str, value_col: str, trim_pct: int = 10
) -> str:
    """DuckDB oracle for :func:`trimmed_mean` — the multiset trim replayed
    as row_number bounds over the same integer cents."""
    return f"""
WITH c AS (
  SELECT {group_col}, CAST(round({value_col} * 100) AS BIGINT) AS v
  FROM {src}
),
r AS (
  SELECT {group_col}, v,
         row_number() OVER (PARTITION BY {group_col} ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM c
)
SELECT {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       round(CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) / 100.0, 6)
         AS trimmed_mean
FROM r
WHERE rn > n * {trim_pct} // 100 AND rn <= n - n * {trim_pct} // 100
GROUP BY {group_col}
"""
