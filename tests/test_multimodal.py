"""Multimodal binary-column plumbing: schemas, batching, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_hadoop_automation_in_cloud_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StringType()),
    ]
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG" + b"x" * 3000, "{}"),
        (2, "audio", b"RIFF" + b"y" * 1500, "{}"),
        (3, "image", None, "{}"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_schema_and_determinism(media):
    out = extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[1]["n_bytes"] == 3004 and rows[3]["n_bytes"] == 0
    assert len(rows[1]["features"]) == FEATURE_DIM
    # deterministic across runs
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows[1]["features"] == again[1]["features"]
    assert "payload" not in out.columns  # binary dropped before any shuffle


def test_extract_features_strict_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|decoding"):
        extract_features(media, strict=True).collect()


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_n_bytes=1000)
    counts = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts[1] == 3  # 3004 bytes → 3 chunks
    assert counts[2] == 1
    assert counts[3] == 1  # empty payload still yields one row


def test_resize_media_deterministic_payload(media):
    from spark_hadoop_automation_in_cloud_spark.multimodal.binary_ops import resize_media

    out = resize_media(media, 32, 32).collect()
    n_target = (32 * 32) // 64
    for r in out:
        assert r["width"] == 32 and r["height"] == 32
        assert len(r["payload"]) == n_target
    # deterministic: same inputs → identical bytes
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_media(media, 32, 32).collect()}
    for r in out:
        assert bytes(r["payload"]) == again[r["media_id"]]


def test_resize_media_strict_raises(media):
    import pytest as _pytest

    from spark_hadoop_automation_in_cloud_spark.multimodal.binary_ops import resize_media

    with _pytest.raises(Exception, match="NotImplementedError|real resizing"):
        resize_media(media, 8, 8, strict=True).collect()
