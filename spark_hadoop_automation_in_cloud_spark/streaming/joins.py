"""Stream-stream joins.

The reference has no streaming engine (SURVEY §2.9: its "streaming" is a
cron-scheduled batch DAG), so this module is part of the Structured
Streaming extension surface: the stream-stream inner interval join, the one
stateful-join shape Structured Streaming supports without a table side.

Semantics contract (and why it is oracle-checkable): for an INNER join with
a time-range condition bounded on both sides, every matched pair is emitted
exactly once regardless of watermark — the watermark only bounds how long
unmatched state is RETAINED, never which matches are produced.  An
availableNow replay over static files therefore emits exactly the batch
interval join's rows, which is the DuckDB oracle for q65.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.functions.timeutils import epoch_us


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window: str = "24 hours",
    watermark: str = "30 days",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event's timestamp
    falls in ``[left.ts, left.ts + window)``.

    Both sides carry (event_id, key, ts).  Output: left_event_id, ``key``,
    right_event_id, gap_min (integer minutes, floor — epoch-micros integer
    math, no double rounding).

    State shape at scale: both inputs shuffle once on ``key``; each
    executor retains only rows younger than its watermark, so state size is
    (events/sec x watermark) per side — bounded, independent of total
    history.  A tighter watermark is the scale lever: it must exceed the
    join window plus max expected disorder, and nothing else.
    """
    l = left.select(
        F.col("event_id").alias("left_event_id"),
        F.col(key),
        F.col("ts").alias("l_ts"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col("event_id").alias("right_event_id"),
        F.col(key).alias("__rk"),
        F.col("ts").alias("r_ts"),
    ).withWatermark("r_ts", watermark)
    joined = l.join(
        r,
        (F.col(key) == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") < F.col("l_ts") + F.expr(f"INTERVAL {window}")),
        "inner",
    )
    gap_min = (
        (epoch_us("r_ts") - epoch_us("l_ts")) / F.lit(60_000_000)
    ).cast("bigint")
    return joined.select(
        "left_event_id", key, "right_event_id", gap_min.alias("gap_min")
    )


def sql_interval_join(
    src: str,
    key: str,
    left_pred: str,
    right_pred: str,
    window_hours: int = 24,
) -> str:
    """DuckDB oracle for :func:`interval_join_stream` over a static table."""
    return f"""
WITH l AS (
  SELECT event_id AS left_event_id, {key}, ts AS l_ts FROM {src} WHERE {left_pred}
),
r AS (
  SELECT event_id AS right_event_id, {key} AS __rk, ts AS r_ts
  FROM {src} WHERE {right_pred}
)
SELECT left_event_id, {key}, right_event_id,
       CAST((epoch_us(r_ts) - epoch_us(l_ts)) // 60000000 AS BIGINT) AS gap_min
FROM l JOIN r
  ON l.{key} = r.__rk
 AND r.r_ts >= l.l_ts
 AND r.r_ts < l.l_ts + INTERVAL {window_hours} HOUR
"""
