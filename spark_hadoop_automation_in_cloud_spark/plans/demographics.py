"""Per-user demographics datamart (reference Q1, ``collector.py:378-560``).

Semantics (re-expressed, determinism fixed — SURVEY §7.5.1/2):
- ``act_city``      — city of the user's latest event (W2 shape; here
                      ``max_by`` with (ts, id) tiebreak, not first-over-
                      desc-window).
- ``travel_*``      — ordered list/count of city *changes* (W4 lag shape,
                      explicit sort keys).
- ``home_city``     — city of the latest stay longer than ``min_stay_days``
                      (reference used 27 days between travels,
                      ``collector.py:490-491``); null-filled with a marker
                      (P9 parity, ``collector.py:516``).
- ``local_ts``      — latest event time shifted to the actual city's tz
                      (reference used from_utc_timestamp with a tz column,
                      ``collector.py:361-366``; the dim here carries an
                      integer UTC offset).

Plan shape at scale: one broadcast 1-NN join (no fact shuffle), then a
single shuffle on user_id shared by all window steps, then aggregation —
the city-frame reuse the reference handled with persist() is a cached
single-pass here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.operators.changes import detect_changes

UNKNOWN_CITY = "Couldn't determine"


def user_demographics(
    events_with_city: DataFrame,
    min_stay_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    city_col: str = "city_name",
    tz_offset_col: str = "tz_offset_hours",
) -> DataFrame:
    """events_with_city: one row per event with nearest-city columns attached
    (output of ``operators.nearest.nearest_neighbor_agg``)."""
    # latest event per user → actual city + local time
    latest = events_with_city.groupBy(user_col).agg(
        F.max_by(
            F.struct(F.col(city_col), F.col(ts_col), F.col(tz_offset_col)),
            F.struct(F.col(ts_col), F.col(id_col)),
        ).alias("__last")
    )
    actual = latest.select(
        user_col,
        F.col(f"__last.{city_col}").alias("act_city"),
        (
            F.col(f"__last.{ts_col}")
            + F.make_interval(hours=F.col(f"__last.{tz_offset_col}"))
        ).alias("local_ts"),
    )

    # city-change points → travel history
    marked = detect_changes(
        events_with_city, user_col, ts_col, city_col, id_col, "is_change"
    )
    travels = marked.where(F.col("is_change") == 1)
    history = travels.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("travel_count"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(ts_col), F.col(id_col), F.col(city_col)))
                ),
                lambda s: s[city_col],
            ),
            ",",
        ).alias("travel_list"),
    )

    # stays: change point → next change point; home = latest stay > min_days
    w_user = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    stays = travels.withColumn("__next_ts", F.lead(ts_col).over(w_user))
    long_stays = stays.where(F.datediff(F.col("__next_ts"), F.col(ts_col)) > min_stay_days)
    home = long_stays.groupBy(user_col).agg(
        F.max_by(city_col, F.struct(F.col(ts_col), F.col(id_col))).alias("home_city")
    )

    return (
        actual.join(history, user_col, "left")
        .join(home, user_col, "left")
        .na.fill({"home_city": UNKNOWN_CITY})
        .select(
            user_col, "act_city", "home_city", "travel_count", "travel_list", "local_ts"
        )
    )
