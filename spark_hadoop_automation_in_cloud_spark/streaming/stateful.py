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

OUTPUT_SCHEMA = "user_id long, n_events long, n_sessions long"
STATE_SCHEMA = "n_events long, n_sessions long, last_ts double"

SESSION_GAP_SECONDS = 30 * 60.0


def _update_user_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n_events, n_sessions, last_ts = (
        state.get if state.exists else (0, 0, float("-inf"))
    )
    for pdf in pdfs:
        ts = pdf["ts"].astype("int64").to_numpy() / 1e9  # epoch seconds
        ts.sort()
        for t in ts:
            if t - last_ts > SESSION_GAP_SECONDS:
                n_sessions += 1
            last_ts = t
            n_events += 1
    state.update((int(n_events), int(n_sessions), float(last_ts)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n_events], "n_sessions": [n_sessions]}
    )


def user_session_totals(events: DataFrame) -> DataFrame:
    """events(user_id, ts, ...) stream → running (n_events, n_sessions)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
