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
