"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-user running totals with inactivity-gap session splitting.

This is the pattern the reference lacks entirely (SURVEY §2.9) and the one
place Python-side state is justified: arbitrary per-key state machines that
windowed aggregation can't express.  Data crosses the JVM↔Python boundary
in Arrow batches, state is one small tuple per key, and the key space
partitions across executors — the standard scalable shape.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from spark_hadoop_automation_in_cloud_spark.functions.timeutils import epoch_us

OUTPUT_SCHEMA = "user_id long, n_events long, n_sessions long"
STATE_SCHEMA = "n_events long, n_sessions long, last_ts_us long"

#: gap math on integer epoch-MICROseconds: exact, so a full replay is
#: bit-equal to the batch lag() formulation (the q33 oracle) — a float
#: seconds representation would admit ulp flips at the threshold.
#:
#: Ordering contract: timestamps are gathered across ALL Arrow chunks of a
#: micro-batch and sorted once, so intra-batch arrival order never matters.
#: ACROSS micro-batches the fold is order-sensitive by design (state folds
#: forward); equivalence to the batch lag() oracle holds for availableNow
#: replays and for live streams whose per-key events arrive batch-monotonic
#: — late cross-batch events would need a watermark-deep reorder buffer.
SESSION_GAP_US = 30 * 60 * 1_000_000
_NEVER = -(1 << 62)


def _update_user_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n_events, n_sessions, last_ts_us = (
        state.get if state.exists else (0, 0, _NEVER)
    )
    # A key's rows can arrive split across several Arrow chunks whose time
    # ranges interleave — gather every timestamp first, sort ONCE, then fold
    # (a per-chunk sort would let last_ts_us go backward and overcount
    # sessions).  ts arrives as int64 epoch-MICROS: user_session_totals
    # projects epoch_us() JVM-side, so the kernel never depends on which
    # datetime unit Arrow/pandas picked for a timestamp column (the round-2
    # `// 1000` here assumed ns and would corrupt a datetime64[us] batch).
    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(pdf["ts"].astype("int64").to_numpy().tolist())
    ts.sort()
    for t in ts:
        if t - last_ts_us > SESSION_GAP_US:
            n_sessions += 1
        last_ts_us = t
        n_events += 1
    state.update((int(n_events), int(n_sessions), int(last_ts_us)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n_events], "n_sessions": [n_sessions]}
    )


def user_session_totals(events: DataFrame) -> DataFrame:
    """events(user_id, ts, ...) stream → running (n_events, n_sessions)."""
    return (
        # epoch_us BEFORE the Python boundary: the kernel folds exact int64
        # micros, immune to Arrow's datetime unit choice and to whether the
        # source delivered TIMESTAMP or TIMESTAMP_NTZ.
        events.select("user_id", epoch_us("ts").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
