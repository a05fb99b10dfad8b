"""Friend-recommendation datamart (reference Q3, ``collector.py:896-1150``).

Pairs of users who (a) share a subscription channel, (b) have never been in
contact, and (c) whose latest known positions are within ``max_km``.

Re-expression vs the reference:
- pairs are canonical (left < right) from the start — the reference emitted
  both orders and deduplicated later (``collector.py:967-974``);
- the contact exclusion is ONE left-anti join on the canonical pair
  (reference did two, ``collector.py:1012-1019``);
- the distance predicate can run as a plain post-join filter (parity) or
  via the grid-bucketed join in ``operators.pairs.geo_bucket_join`` when
  candidate volume explodes (SURVEY §4's 100 TB path).

Scale: the self-join on channel is the quadratic risk; AQE skew-join is on
session-wide, and the candidate frame never carries payload wider than the
two user ids until after both filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.operators.pairs import (
    exclude_pairs,
    self_pairs,
    within_distance,
)


def friend_recommendations(
    subscriptions: DataFrame,  # (user_id, channel)
    contacts: DataFrame,  # (user_a, user_b) any order
    last_positions: DataFrame,  # (user_id, lat, lon)
    max_km: float,
) -> DataFrame:
    """Output: left_user_id, right_user_id, distance_km (rounded 4dp)."""
    subs = subscriptions.select("user_id", "channel").distinct()
    cand = (
        self_pairs(subs, "channel", "user_id")
        .select("left_user_id", "right_user_id")
        .distinct()
    )
    cand = exclude_pairs(
        cand, contacts, "left_user_id", "right_user_id", "user_a", "user_b"
    )

    lpos = last_positions.select(
        F.col("user_id").alias("left_user_id"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
    )
    rpos = last_positions.select(
        F.col("user_id").alias("right_user_id"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    # plain equi-joins; at scale last_positions is large, so no broadcast
    # hint — AQE picks broadcast only if the runtime size allows
    enriched = cand.join(lpos, "left_user_id").join(rpos, "right_user_id")
    near = within_distance(enriched, "lat1", "lon1", "lat2", "lon2", max_km)
    return near.select(
        "left_user_id",
        "right_user_id",
        F.round("distance_km", 4).alias("distance_km"),
    )
