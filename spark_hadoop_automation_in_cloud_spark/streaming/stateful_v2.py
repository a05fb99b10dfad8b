"""The session-totals operator on Spark 4's ``transformWithStateInPandas``
— the successor API to ``applyInPandasWithState`` (``stateful.py``).

Why both exist: ``applyInPandasWithState`` is the stable, widely-deployed
shape; ``transformWithStateInPandas`` (SPARK-49564, the Arbitrary State
API v2) adds composable typed state (value/list/map), timers, and TTL,
and is where new Structured Streaming state features land.  The engine
ships the SAME operator on both so a deployment can choose per its Spark
version, and the equivalence test (tests/test_streaming.py) pins the two
implementations output-identical on a full replay — which is also a
cross-validation of the session-splitting kernel itself.

Requires the RocksDB state store provider (a transformWithState
constraint); ``run_session_totals_v2`` scopes that conf to the drain.
The API's worker IPC additionally needs ``google.protobuf`` — check
:func:`v2_available` before wiring a pipeline to this module (the
equivalence test skips where protobuf is absent; the v1 operator is the
portable default).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from spark_hadoop_automation_in_cloud_spark.functions.timeutils import epoch_us
from spark_hadoop_automation_in_cloud_spark.streaming.stateful import (
    SESSION_GAP_US,
    _NEVER,
)

OUTPUT_SCHEMA = "user_id long, n_events long, n_sessions long"
_STATE_SCHEMA = "n_events long, n_sessions long, last_ts_us long"

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def v2_available() -> bool:
    """True when the transformWithState worker's protobuf IPC dependency is
    importable — the deployment gate for this module."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class SessionTotalsProcessor(StatefulProcessor):
    """Per-user running (n_events, n_sessions) with 30-min gap splitting —
    the same fold as ``stateful._update_user_state``, expressed as a
    ValueState machine."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n_events, n_sessions, last_ts_us = (
            self._totals.get() if self._totals.exists() else (0, 0, _NEVER)
        )
        # gather ALL timestamps, sort ONCE (same cross-chunk ordering
        # contract as stateful.py — ts arrives as int64 epoch-micros)
        ts: list[int] = []
        for pdf in rows:
            ts.extend(pdf["ts"].astype("int64").to_numpy().tolist())
        ts.sort()
        for t in ts:
            if t - last_ts_us > SESSION_GAP_US:
                n_sessions += 1
            last_ts_us = t
            n_events += 1
        self._totals.update((int(n_events), int(n_sessions), int(last_ts_us)))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
            }
        )

    def close(self) -> None:
        pass


def user_session_totals_v2(events: DataFrame) -> DataFrame:
    """events(user_id, ts, ...) stream → running (n_events, n_sessions),
    via the Arbitrary State API v2."""
    return (
        events.select("user_id", epoch_us("ts").alias("ts"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_session_totals_v2(events: DataFrame, query_name: str) -> None:
    """availableNow drain with the RocksDB state store scoped on (a
    transformWithState requirement), restored after."""
    spark = events.sparkSession
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB)
    try:
        q = (
            user_session_totals_v2(events)
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if before is not None:
            spark.conf.set(key, before)
        else:
            spark.conf.unset(key)
