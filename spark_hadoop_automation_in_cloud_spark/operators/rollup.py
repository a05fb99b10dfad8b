"""Calendar rollup operators (week-in-month aggregation).

Reference Q2 (SURVEY §2.4 A1/A4): per (zone, week, month) event counts with
the month total replicated onto every week row via an unbounded window SUM
(``src/spark/collector.py:627, 668-674``).

Two equivalent physical forms are provided:

- ``weekly_with_month_window`` — groupBy (keys, week, month) count, then
  ``sum(...) over (partition by keys, month)``.  Two shuffles (agg + window)
  but the window input is already reduced to one row per (keys, week), so
  the second exchange is tiny.  This mirrors the reference.
- ``weekly_with_month_join`` — the same result as a re-aggregation +
  broadcastable join; useful when the week-level frame is reused (cache it,
  derive both granularities without a window sort).

At 100 TB the dominant cost is the first partial aggregation, which
map-side-combines; both forms are safe.  The month column is derivable from
week (trunc) — carried explicitly to match reference output schema.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weekly_with_month_window(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    count_alias: str = "week_cnt",
    month_alias: str = "month_cnt",
) -> DataFrame:
    """Count per (keys, week) + month total on each week row (window form)."""
    weekly = (
        df.withColumn("week", F.date_trunc("week", F.col(ts_col)))
        .withColumn("month", F.date_trunc("month", F.col(ts_col)))
        .groupBy(*keys, "week", "month")
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
    w = Window.partitionBy(*keys, "month")
    return weekly.withColumn(month_alias, F.sum(count_alias).over(w))


def weekly_with_month_join(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    count_alias: str = "week_cnt",
    month_alias: str = "month_cnt",
) -> DataFrame:
    """Same result via week-level agg → month re-agg → equi-join."""
    weekly = (
        df.withColumn("week", F.date_trunc("week", F.col(ts_col)))
        .withColumn("month", F.date_trunc("month", F.col(ts_col)))
        .groupBy(*keys, "week", "month")
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
    monthly = weekly.groupBy(*keys, "month").agg(F.sum(count_alias).alias(month_alias))
    return weekly.join(monthly, [*keys, "month"], "inner")


def weekly_with_month_grouping_sets(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    count_alias: str = "week_cnt",
    month_alias: str = "month_cnt",
) -> DataFrame:
    """Same result via GROUPING SETS ((keys, month, week), (keys, month)):
    ONE aggregation pass emits both granularities (SURVEY §2.4 A4's third
    equivalent form), then the week rows pick up their month total with a
    broadcastable equi-join against the (much smaller) month rows.

    Versus the window form this trades the window sort for a join whose
    build side has one row per (keys, month) — preferable when months are
    few and weeks are many, or when the month frame is reused elsewhere.
    """
    base = df.withColumn("week", F.date_trunc("week", F.col(ts_col))).withColumn(
        "month", F.date_trunc("month", F.col(ts_col))
    )
    gs = base.groupingSets(
        [[*keys, "month", "week"], [*keys, "month"]], *keys, "month", "week"
    ).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.grouping("week").alias("__is_month_row"),
    )
    weekly = gs.where(F.col("__is_month_row") == 0).select(
        *keys, "week", "month", F.col("__cnt").alias(count_alias)
    )
    monthly = gs.where(F.col("__is_month_row") == 1).select(
        *keys, "month", F.col("__cnt").alias(month_alias)
    )
    return weekly.join(monthly, [*keys, "month"], "inner")
