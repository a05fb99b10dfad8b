"""Per-zone week/month activity rollup (reference Q2,
``collector.py:562-894``).

For each event class, count per (zone, week, month) and replicate the month
total onto each week row; then inner-join the per-class frames on
(zone_id, week, month).  Inner semantics deliberately mirror the reference
(zones missing any class in a cell drop out — documented choice, SURVEY
§7.5.5).

Scale notes: the reference persisted the zone-tagged event frame and ran 4
sequential branches (``collector.py:623-625``); here the same single-pass
pivot is expressed as ONE aggregation with conditional counts — one shuffle
total instead of 4 aggregations + 3 joins.  The join form is kept for
parity/testing (``rollup_join_form``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zone_week_month_rollup(
    events_with_zone: DataFrame,
    event_types: Sequence[str],
    zone_col: str = "zone_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Pivot form: one aggregation, conditional counts per class, month
    totals via one window per class over the already-tiny weekly frame.

    Output: zone_id, week, month, week_<t>, month_<t> for each t — the
    reference's Q2 schema shape (``collector.py:850-864``).  Cells where a
    class has zero events keep 0 (the inner-join parity filter is applied
    by ``require_all_classes``).
    """
    base = events_with_zone.withColumn(
        "week", F.date_trunc("week", F.col(ts_col))
    ).withColumn("month", F.date_trunc("month", F.col(ts_col)))
    weekly = base.groupBy(zone_col, "week", "month").agg(
        *[
            F.count(F.when(F.col(type_col) == t, 1)).alias(f"week_{t}")
            for t in event_types
        ]
    )
    w = Window.partitionBy(zone_col, "month")
    for t in event_types:
        weekly = weekly.withColumn(f"month_{t}", F.sum(f"week_{t}").over(w))
    return weekly


def require_all_classes(rollup: DataFrame, event_types: Sequence[str]) -> DataFrame:
    """Reference-parity inner-join semantics: keep only (zone, week) cells
    where every event class occurred (``collector.py:819-823`` + dropna)."""
    cond = None
    for t in event_types:
        c = F.col(f"week_{t}") > 0
        cond = c if cond is None else (cond & c)
    return rollup.where(cond)


def rollup_join_form(
    events_with_zone: DataFrame,
    event_types: Sequence[str],
    zone_col: str = "zone_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Literal reference plan: one aggregation per class + (n-1) inner joins
    on (zone, week, month).  Kept for parity testing and as the shape to
    benchmark the pivot form against."""
    frames = []
    for t in event_types:
        branch = (
            events_with_zone.where(F.col(type_col) == t)
            .withColumn("week", F.date_trunc("week", F.col(ts_col)))
            .withColumn("month", F.date_trunc("month", F.col(ts_col)))
            .groupBy(zone_col, "week", "month")
            .agg(F.count(F.lit(1)).alias(f"week_{t}"))
        )
        w = Window.partitionBy(zone_col, "month")
        frames.append(branch.withColumn(f"month_{t}", F.sum(f"week_{t}").over(w)))
    out = frames[0]
    for f in frames[1:]:
        out = out.join(f, [zone_col, "week", "month"], "inner")
    return out
