"""Streaming surface: availableNow replay must equal the batch rollup, and
the custom stateful operator must produce exact totals."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.io import read_table
from spark_hadoop_automation_in_cloud_spark.streaming.rollup_stream import (
    run_available_now,
    stream_events,
    weekly_counts_stream,
)
from spark_hadoop_automation_in_cloud_spark.streaming.stateful import user_session_totals


@pytest.fixture()
def events_dir(sf_dir, tmp_path):
    """File-stream sources require a directory; expose the single events
    parquet file through one."""
    d = tmp_path / "events_stream"
    d.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_streaming_weekly_rollup_matches_batch(spark, sf_dir, events_dir):
    stream = stream_events(spark, events_dir)
    run_available_now(weekly_counts_stream(stream), "weekly_stream")
    got = spark.sql("SELECT event_type, week, week_cnt FROM weekly_stream")

    batch = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("week", F.col("ts")).alias("week")
        )
        .agg(F.count(F.lit(1)).alias("week_cnt"))
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stateful_user_sessions(spark, sf_dir, events_dir):
    stream = stream_events(spark, events_dir)
    q = (
        user_session_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one availableNow pass → latest update per user is the full total
    got = spark.sql(
        "SELECT user_id, max(n_events) AS n_events FROM user_totals GROUP BY user_id"
    )
    expected = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
