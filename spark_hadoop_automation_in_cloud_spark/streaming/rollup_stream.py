"""Streaming weekly rollup: the streaming twin of
``plans.activity_rollup`` (batch Q2).

``readStream`` over the parquet event table → watermark on the event time →
tumbling 7-day windows aligned to Monday (epoch 1970-01-01 was a Thursday,
so a 4-day ``startTime`` offset makes windows coincide with
``date_trunc('week')``) → per (event_type, window) counts.

Late data: rows older than the watermark horizon are dropped by the engine;
in ``availableNow`` replays everything is on time, so the batch and stream
results must agree exactly — that equivalence is asserted in
``tests/test_streaming.py``.

Scale: stateful aggregation keyed by (event_type, window) — state size is
bounded by #types × #open windows, trivially small; the watermark bounds
how long windows stay open.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_hadoop_automation_in_cloud_spark.functions.timeutils import ntz_to_utc_timestamp
from spark_hadoop_automation_in_cloud_spark.io import _NANOS_CONF, _read_parquet_any_ts

MONDAY_ALIGN = "4 days"  # epoch-align weekly tumbling windows to Monday


@contextmanager
def legacy_nanos_stream_scope(spark: SparkSession):
    """Snapshot-and-restore ``spark.sql.legacy.parquet.nanosAsLong`` around
    a legacy-nanos stream's LIFETIME.

    :func:`stream_events` must leave the conf set un-scoped while such a
    stream is live (each micro-batch re-reads footers), which means an
    unrelated *batch* ``spark.read.parquet`` on the same session would
    read nanos ts columns as ``bigint`` until the conf is cleared.  A
    caller sharing the session wraps stream start → stop in this scope (or
    routes all concurrent reads through ``io.read_table``, which
    normalizes either way); the conf returns to its prior state on exit
    even if the drain raises.
    """
    before = spark.conf.get(_NANOS_CONF, None)
    try:
        yield
    finally:
        if before is not None:
            spark.conf.set(_NANOS_CONF, before)
        else:
            spark.conf.unset(_NANOS_CONF)


def stream_events(
    spark: SparkSession, path: str, reader_options: dict[str, str] | None = None
) -> DataFrame:
    """File-stream source over the event table, with ``ts`` normalized to
    ``TIMESTAMP`` whatever the files' parquet encoding is.

    The file schema is INFERRED FROM A BATCH READ of the same path (the
    FileStreamSource requires an explicit schema) rather than hardcoded —
    round 2 hardcoded the legacy nanos-as-long schema and silently shrank
    every micros-encoded timestamp 1000×.  The batch probe goes through
    ``io._read_parquet_any_ts``, so all three historical encodings resolve:

    - ``TIMESTAMP``/``TIMESTAMP_NTZ`` (micros): stream with the inferred
      schema; NTZ is reinterpreted under the UTC session timezone
      (value-preserving cast).
    - legacy TIMESTAMP(NANOS) → ``bigint`` epoch-nanos: the parquet reader
      needs ``nanosAsLong`` for the LIFETIME of the stream (each micro-batch
      re-reads footers), so only on this path the conf is set un-scoped, and
      the long is truncated to micros.  Callers sharing the session with
      batch reads should wrap stream start → stop in
      :func:`legacy_nanos_stream_scope`, which restores the conf on exit
      (direct batch ``spark.read.parquet`` of nanos files would otherwise
      keep coming back ``bigint`` after the stream stops; ``io.read_table``
      normalizes under either conf state).

    ``path`` may be a directory (the file source's native shape) or a single
    parquet file — the latter is exposed through its parent directory with a
    ``pathGlobFilter``, since FileStreamSource requires a directory basePath.

    An EMPTY landing directory (stream started before the first producer
    write — the canonical FileStreamSource pattern) can't be probed, so the
    stream falls back to the canonical events schema with ``ts TIMESTAMP``:
    files that later arrive micros- or INT96-encoded read fine; a LEGACY
    nanos producer must land at least one file before stream start (the
    encoding is undetectable from nothing).
    """
    try:
        raw_schema = _read_parquet_any_ts(spark, path).schema
    except Exception as e:  # noqa: BLE001 — only the empty-DIRECTORY case
        # A nonexistent path stays a loud error: swallowing PATH_NOT_FOUND
        # here would silently build the stream against a file path that the
        # isfile() redirection below can't see yet (the file doesn't exist),
        # leaving a FileStreamSource whose basePath is a file.
        if "UNABLE_TO_INFER_SCHEMA" not in str(e):
            raise
        raw_schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
    ts_dtype = {f.name: f.dataType.simpleString() for f in raw_schema}.get("ts")
    if ts_dtype == "bigint":
        # legacy nanos files: the conf must outlive this call (see docstring)
        spark.conf.set(_NANOS_CONF, "true")
    reader = spark.readStream.schema(raw_schema)
    for key, val in (reader_options or {}).items():
        # e.g. maxFilesPerTrigger — applied here so batch-sizing callers
        # keep the encoding probe/normalization instead of rebuilding a
        # raw reader around it
        reader = reader.option(key, val)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    if ts_dtype == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if ts_dtype == "timestamp_ntz":
        return raw.withColumn("ts", ntz_to_utc_timestamp("ts"))
    return raw


def weekly_counts_stream(
    events: DataFrame, watermark: str = "14 days"
) -> DataFrame:
    """Tumbling Monday-aligned weekly counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.col("event_type"),
            F.window("ts", "7 days", "7 days", MONDAY_ALIGN).alias("win"),
        )
        .agg(F.count(F.lit(1)).alias("week_cnt"))
        .select(
            "event_type",
            F.col("win.start").alias("week"),
            "week_cnt",
        )
    )


def run_available_now(
    result: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    shuffle_partitions: int = 16,
) -> None:
    """Drain the full input as one availableNow run into a memory sink.

    Streaming disables AQE, so the state-store/shuffle partition count is
    taken literally from ``spark.sql.shuffle.partitions`` — on a default
    session that is 200 near-empty tasks per micro-batch.  The conf is
    temporarily pinned to ``shuffle_partitions`` for the drain and restored
    after (a per-deployment streaming job would size this to its key
    cardinality and executor count instead).
    """
    spark = result.sparkSession
    before = spark.conf.get("spark.sql.shuffle.partitions", None)
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions:
            if before is not None:
                spark.conf.set("spark.sql.shuffle.partitions", before)
            else:
                spark.conf.unset("spark.sql.shuffle.partitions")


def daily_sliding_week_counts_stream(
    events: DataFrame, watermark: str = "14 days"
) -> DataFrame:
    """Sliding windows: 7-day span advancing 1 day — each event contributes
    to 7 overlapping windows (trailing-week activity, refreshed daily).
    State per key = #open windows × #types, bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.col("event_type"),
            F.window("ts", "7 days", "1 day").alias("win"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "event_type",
            F.col("win.start").alias("window_start"),
            "cnt",
        )
    )
