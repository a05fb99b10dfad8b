"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the synthetic tables — the correctness layer for the
custom operators whose search space a fixed fixture can't cover.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.operators.pairs import (
    geo_bucket_join,
    within_distance,
)

coord = st.tuples(
    st.floats(min_value=-60.0, max_value=60.0, allow_nan=False),
    st.floats(min_value=-160.0, max_value=160.0, allow_nan=False),
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=st.lists(coord, min_size=2, max_size=40), km=st.sampled_from([50.0, 300.0, 1500.0]))
def test_geo_bucket_join_equals_naive_on_random_points(spark, pts, km):
    """Grid-bucketed distance join ≡ naive theta join for arbitrary points
    and thresholds (no false negatives from cell sizing, no false positives
    past the exact refilter)."""
    rows = [(i, float(lat), float(lon)) for i, (lat, lon) in enumerate(pts)]
    l = spark.createDataFrame(rows, ["lid", "lat1", "lon1"])
    r = spark.createDataFrame(rows, ["rid", "lat2", "lon2"])
    naive = within_distance(
        l.crossJoin(r).where(F.col("lid") < F.col("rid")),
        "lat1", "lon1", "lat2", "lon2", km,
    ).select("lid", "rid")
    bucketed = (
        geo_bucket_join(l, r, km)
        .where(F.col("lid") < F.col("rid"))
        .select("lid", "rid")
    )
    a = {(x.lid, x.rid) for x in naive.collect()}
    b = {(x.lid, x.rid) for x in bucketed.collect()}
    assert a == b


@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(st.sampled_from("abcdefgh"), min_size=30, max_size=60),
    flips=st.integers(min_value=0, max_value=5),
)
def test_minhash_estimates_jaccard(spark, base, flips):
    """MinHash signature agreement must approximate true shingle Jaccard:
    identical docs agree on every permutation; heavily-edited docs agree on
    few.  (16 permutations → coarse estimate; assert the envelope, not the
    point value.)"""
    from spark_hadoop_automation_in_cloud_spark.operators.dedup import (
        NUM_PERM,
        minhash_signatures,
        shingle_rows,
    )

    words = list(base)
    edited = words.copy()
    for i in range(flips):
        edited[i * 2] = edited[i * 2].upper()  # token-level edits
    df = spark.createDataFrame(
        [(0, " ".join(words)), (1, " ".join(edited))], ["doc_id", "text"]
    )
    sh = shingle_rows(df, "doc_id", "text", n=2)
    sig = minhash_signatures(sh).collect()
    s = {r["doc_id"]: [r[f"mh_{i}"] for i in range(NUM_PERM)] for r in sig}
    agree = sum(a == b for a, b in zip(s[0], s[1])) / NUM_PERM

    shingles = {r["doc_id"]: set() for r in sh.collect()}
    for r in sh.collect():
        shingles[r["doc_id"]].add(r["shingle"])
    inter = len(shingles[0] & shingles[1])
    union = len(shingles[0] | shingles[1])
    true_j = inter / union
    # 16-perm estimate: allow a wide but bounded deviation
    assert abs(agree - true_j) <= 0.45
    if flips == 0:
        assert agree == 1.0


def test_haversine_metric_properties(spark):
    """Symmetry, identity, and non-negativity of the distance expression."""
    from spark_hadoop_automation_in_cloud_spark.functions.geo import haversine_km

    pts = [(-33.5, 151.2), (40.7, -74.0), (55.75, 37.6), (0.0, 0.0), (-60.0, 160.0)]
    rows = [
        (la1, lo1, la2, lo2)
        for (la1, lo1) in pts
        for (la2, lo2) in pts
    ]
    df = spark.createDataFrame(rows, ["la1", "lo1", "la2", "lo2"])
    got = df.select(
        "la1", "lo1", "la2", "lo2",
        haversine_km(F.col("la1"), F.col("lo1"), F.col("la2"), F.col("lo2")).alias("d"),
        haversine_km(F.col("la2"), F.col("lo2"), F.col("la1"), F.col("lo1")).alias("dr"),
    ).collect()
    for r in got:
        assert r["d"] >= 0
        assert math.isclose(r["d"], r["dr"], rel_tol=1e-12)
        if (r["la1"], r["lo1"]) == (r["la2"], r["lo2"]):
            assert r["d"] == 0.0
