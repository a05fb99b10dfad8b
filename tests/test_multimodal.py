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
    with pytest.raises(Exception, match="real decoder"):
        extract_features(media, strict=True).collect()


def test_extract_features_decoder_injection(spark):
    """strict=True must have a production path: inject a REAL (if tiny)
    decoder — struct-packed gray bitmaps (`<II` width/height header +
    raw pixel bytes) featurized as a normalized 16-bin intensity
    histogram — and check decoded dimensions and features come through
    the Arrow kernel unchanged.  Defined as a closure so cloudpickle
    ships it by value (a production decoder lives in an importable
    module instead, per the Decoder contract note)."""
    import struct

    def _bitmap_decode(payload: bytes):
        import struct

        import numpy as np

        if len(payload) < 8:
            return 0, 0, np.zeros(16, dtype=np.float32)
        w, h = struct.unpack_from("<II", payload)
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=8)
        hist = np.histogram(px, bins=16, range=(0, 256))[0]
        return w, h, (hist / max(1, px.size)).astype(np.float32)

    img = struct.pack("<II", 4, 3) + bytes([0] * 6 + [255] * 6)  # half dark, half bright
    rows = [(1, "image", img, "{}"), (2, "image", None, "{}")]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in extract_features(media, strict=True, decode=_bitmap_decode).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (4, 3)
    feats = out[1]["features"]
    assert len(feats) == FEATURE_DIM
    assert abs(feats[0] - 0.5) < 1e-6 and abs(feats[15] - 0.5) < 1e-6
    assert sum(feats[1:15]) == 0.0
    assert (out[2]["width"], out[2]["height"]) == (0, 0)  # null payload


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

    with _pytest.raises(Exception, match="real resizer"):
        resize_media(media, 8, 8, strict=True).collect()


def test_resize_media_resizer_injection(media):
    """Inject a real (if trivial) resizer through the strict seam: exact
    target-byte-count crop/pad — the kernel must carry the injected bytes
    through unchanged."""
    from spark_hadoop_automation_in_cloud_spark.multimodal.binary_ops import resize_media

    def crop_pad(payload: bytes, w: int, h: int) -> bytes:
        return payload[: w * h].ljust(w * h, b"\x00")

    out = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_media(media, 8, 4, strict=True, resize=crop_pad).collect()
    }
    assert all(len(p) == 32 for p in out.values())
    assert out[1] == (b"\x89PNG" + b"x" * 3000)[:32]
    assert out[3] == b"\x00" * 32  # null payload → all padding


def test_fake_codec_warns_once_and_output_unchanged(media):
    """When strict=False and no codec is injected, the built-in fake must
    announce itself with exactly ONE construction-time RuntimeWarning —
    silent-garbage features must not be able to reach production unnoticed
    — and the warning must not change the output."""
    import warnings as _w

    from spark_hadoop_automation_in_cloud_spark.multimodal.binary_ops import (
        resize_media,
    )

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = extract_features(media)
        fake_warns = [w for w in rec if "FAKE decode" in str(w.message)]
    assert len(fake_warns) == 1
    assert issubclass(fake_warns[0].category, RuntimeWarning)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 3 and len(rows[1]["features"]) == FEATURE_DIM

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        resize_media(media, 8, 8)
        assert sum("FAKE resize" in str(w.message) for w in rec) == 1

    # an injected codec is the production path: no warning at all
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        extract_features(media, decode=lambda p: (1, 1, [0.0] * FEATURE_DIM))
        assert not [w for w in rec if "FAKE" in str(w.message)]
