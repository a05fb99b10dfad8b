"""Raw event schema + struct flattening (reference ``src/spark/mover.py``).

The raw layer is one wide nested struct per row (``event`` with ~16 sparse
fields including a 2-level ``media`` struct) plus ``event_type`` and a
timestamp.  The mover projects it into 21 flat columns and derives the
``date`` partition key (``mover.py:49-105``).

Here flattening is a single ``select`` of nested field paths — pure
projection, no shuffle, stays in whole-stage codegen; the reference's
``repartition(56)`` after read (``mover.py:47``) is dropped in favor of AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("src", T.StringType()),
    ]
)

#: raw nested schema (field list mirrors the reference's event struct,
#: mover.py:50-76)
RAW_EVENT_STRUCT = T.StructType(
    [
        T.StructField("admins", T.ArrayType(T.StringType())),
        T.StructField("channel_id", T.LongType()),
        T.StructField("datetime", T.StringType()),  # 'yyyy-MM-dd HH:mm:ss'
        T.StructField("media", MEDIA_STRUCT),
        T.StructField("message", T.StringType()),
        T.StructField("message_channel_to", T.LongType()),
        T.StructField("message_from", T.LongType()),
        T.StructField("message_group", T.LongType()),
        T.StructField("message_id", T.LongType()),
        T.StructField("message_to", T.LongType()),
        T.StructField("message_ts", T.StringType()),  # may carry fractional secs
        T.StructField("reaction_from", T.LongType()),
        T.StructField("reaction_type", T.StringType()),
        T.StructField("subscription_channel", T.LongType()),
        T.StructField("subscription_user", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("user", T.LongType()),
    ]
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField("event", RAW_EVENT_STRUCT),
        T.StructField("event_type", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)

TS_FORMAT = "yyyy-MM-dd HH:mm:ss"


def flatten_raw_events(raw: DataFrame) -> DataFrame:
    """Raw nested frame → 21 flat staging columns + ``date`` partition key.

    Semantics parity with ``mover.py:49-105``:
    - ``datetime`` parsed with the fixed second-resolution format;
    - ``message_ts`` strips fractional seconds (split on '.') before parse;
    - 2-level ``media`` struct becomes ``media_type`` / ``media_src``;
    - ``date`` = yyyy-MM-dd of ``datetime`` (partition key).
    """
    e = F.col("event")
    dt = F.to_timestamp(e["datetime"], TS_FORMAT)
    msg_ts = F.to_timestamp(
        F.split(e["message_ts"], r"\.").getItem(0), TS_FORMAT
    )
    return raw.select(
        e["admins"].alias("admins"),
        e["channel_id"].alias("channel_id"),
        dt.alias("datetime"),
        e["media"]["media_type"].alias("media_type"),
        e["media"]["src"].alias("media_src"),
        e["message"].alias("message"),
        e["message_channel_to"].alias("message_channel_to"),
        e["message_from"].alias("message_from"),
        e["message_group"].alias("message_group"),
        e["message_id"].alias("message_id"),
        e["message_to"].alias("message_to"),
        msg_ts.alias("message_ts"),
        e["reaction_from"].alias("reaction_from"),
        e["reaction_type"].alias("reaction_type"),
        e["subscription_channel"].alias("subscription_channel"),
        e["subscription_user"].alias("subscription_user"),
        e["tags"].alias("tags"),
        e["user"].alias("user"),
        F.col("lat"),
        F.col("lon"),
        F.col("event_type"),
        F.date_format(dt, "yyyy-MM-dd").alias("date"),
    )
