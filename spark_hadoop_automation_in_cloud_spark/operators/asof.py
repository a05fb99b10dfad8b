"""As-of (time-series point) join — match each left row with the latest
right row at-or-before its timestamp, per key.

The reference has no such operator (SURVEY §2.3 end note: no as-of/interval
joins); it is added as a first-class extension because event-lake pipelines
constantly need "state as of event time" enrichment.

Spark-first design — the union-and-window form, NOT a range join:
- tag both inputs, union them into one (key, ts, tag) stream;
- one window per key ordered by (ts, tag) with right rows sorting before
  left rows on timestamp ties (giving the standard ``<=`` as-of semantics);
- ``last(payload, ignorenulls=True)`` over an unbounded-preceding frame
  carries the latest right payload forward onto every left row.

Cost model at 100 TB: exactly ONE shuffle of (|left| + |right|) rows keyed
by the join key, then a per-partition sort — no per-row range scan, no
candidate blowup, no broadcast requirement on either side.  A naive
theta-join (``r.ts <= l.ts`` + argmax) explodes quadratically per key; this
form is linear in input size.  Hot keys split via AQE skew handling.

Determinism: callers must ensure ≤1 right row per (key, right_ts) — e.g.
pre-aggregate with ``max_by`` — otherwise "the" latest row at a timestamp
is undefined in any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` payload
    with ``right_ts <= left_ts`` on the same ``keys`` (null if none).

    Output: ``keys``, all other left columns, then ``{payload_prefix}{col}``
    for each payload column and ``{payload_prefix}{right_ts}`` (the matched
    right timestamp).
    """
    keys = list(keys)
    left_cols = [c for c in left.columns if c not in keys]
    payload = list(right_payload)

    l_half = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
    )
    r_half = right.where(
        # a NULL right timestamp would sort FIRST in the union window and
        # be carried as the as-of match for every earlier left row; the
        # `right.ts <= left.ts` contract (and the DuckDB ASOF oracle)
        # excludes such rows entirely
        F.col(right_ts).isNotNull()
    ).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"), *[F.col(c) for c in payload]
        ).alias("__r"),
    )
    l_type = l_half.schema["__l"].dataType
    r_type = r_half.schema["__r"].dataType
    unioned = l_half.withColumn("__r", F.lit(None).cast(r_type)).unionByName(
        r_half.withColumn("__l", F.lit(None).cast(l_type))
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    return carried.where(F.col("__is_left") == 1).select(
        *keys,
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__match.{c}").alias(f"{payload_prefix}{c}") for c in payload],
        F.col("__match.__matched_ts").alias(f"{payload_prefix}{right_ts}"),
    )
