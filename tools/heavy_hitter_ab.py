"""A/B the count-min-screened exact heavy hitters against the naive
groupBy census, writing HEAVY_HITTERS.json at the repo root.

The claim under test (operators/sketches.py heavy_hitters_exact, q126):
the screen's exact aggregation holds CANDIDATE keys only, so its state
and shuffle are bounded by the heavy tail, not the distinct-key space —
at the cost of one extra scan (the count-min build).  At sf0.1's 20k
distinct part keys the naive census is trivially cheap and WINS on wall
(recorded honestly below); the screen's value is the asymptote: the
candidate fraction is what survives a 100x key-space blowup, the naive
census's hash-aggregate state is what doesn't.  To show the crossover
empirically, the synthetic ladder widens the key space at constant heavy
tail — the naive side's state grows linearly, the screened side's stays
at the candidates.

Three records per input:
  - equality: screened result == naive result (exactness, every rung);
  - candidate stats: distinct keys, candidates admitted by the screen,
    true heavies (fraction = candidates/distinct);
  - walls: median-of-3 for both variants.

Run: ``python tools/heavy_hitter_ab.py`` (env ``SPARK_GRAFT_SF_DIR``,
``SPARK_GRAFT_HH_SCALES`` comma-list of synthetic key-space multipliers,
default "1,10,30").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.io import read_table
from spark_hadoop_automation_in_cloud_spark.operators.sketches import (
    _hh_estimate,
    _hh_table,
    heavy_hitters_exact,
)
from spark_hadoop_automation_in_cloud_spark.session import get_test_session

THRESHOLD = 42
DEPTH, WIDTH = 4, 32768


def naive(df, key, t):
    return (
        df.where(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .where(F.col("freq") >= t)
    )


def median3(fn) -> float:
    walls = []
    for _ in range(3):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return round(sorted(walls)[1], 3)


def measure(df, key, threshold) -> dict:
    want = sorted((r[key], r["freq"]) for r in naive(df, key, threshold).collect())
    got = sorted(
        (r[key], r["freq"])
        for r in heavy_hitters_exact(df, key, threshold, DEPTH, WIDTH).collect()
    )
    assert got == want, "screened result diverged from the naive census"
    table = _hh_table(df, key, DEPTH, WIDTH)
    est = _hh_estimate(F.col(key), table)
    cand = df.where(est >= threshold).select(key).distinct().count()
    distinct = df.select(key).distinct().count()
    return {
        "distinct_keys": distinct,
        "candidates": cand,
        "true_heavy": len(want),
        "candidate_fraction": round(cand / max(distinct, 1), 4),
        "wall_screened_s": median3(
            lambda: heavy_hitters_exact(df, key, threshold, DEPTH, WIDTH).count()
        ),
        "wall_naive_s": median3(lambda: naive(df, key, threshold).count()),
    }


def make_synthetic(spark, scale: int, hot_occurrences: int):
    """scale*200k singleton cold keys + 500 hot keys at hot_occurrences
    each — ONE corpus builder for the constant-support ladder and the
    blown-geometry contrast, so the two always measure the same shape."""
    cold = spark.range(200_000 * scale).select(
        F.concat(F.lit("cold"), F.col("id")).alias("key")
    )
    hot = (
        spark.range(500)
        .crossJoin(
            spark.range(hot_occurrences).withColumnRenamed("id", "__r")
        )
        .select(F.concat(F.lit("hot"), F.col("id")).alias("key"))
    )
    df = cold.unionByName(hot).repartition(32).cache()
    df.count()
    return df


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scales = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_HH_SCALES", "1,10,30").split(",")
    ]
    spark = get_test_session()
    out: dict = {"sf_dir": sf_dir, "threshold": THRESHOLD,
                 "geometry": {"depth": DEPTH, "width": WIDTH}}

    li = read_table(spark, sf_dir, "lineitem", parallelize=True).cache()
    li.count()
    out["lineitem_partkey"] = measure(li, "l_partkey", THRESHOLD)
    li.unpersist()

    # synthetic ladder at CONSTANT SUPPORT — the guarantee count-min
    # actually gives: "heavy" means frequency >= phi * N, so threshold
    # and hot-key frequency both grow with the corpus (500 hot keys at
    # 100*scale occurrences over scale*200k singleton cold keys,
    # threshold 100*scale).  Candidate fraction should stay FLAT as the
    # key space and volume grow together — that flatness is the 100x
    # claim; the census's hash-aggregate state meanwhile grows with
    # distinct_keys.
    ladder = []
    for scale in scales:
        df = make_synthetic(spark, scale, hot_occurrences=100 * scale)
        m = measure(df, "key", 100 * scale)
        m["scale"] = scale
        m["threshold"] = 100 * scale
        ladder.append(m)
        df.unpersist()
    out["synthetic_ladder"] = ladder

    # the documented FAILURE MODE, kept on purpose: a constant ABSOLUTE
    # threshold while N grows 30x blows the geometry (avg cell mass
    # N/width exceeds the threshold, the screen admits every key —
    # candidate_fraction 1.0) yet the RESULT stays exact: pruning
    # degrades, correctness never does.  Sizing rule recorded here:
    # keep width >= ~8 * N / threshold, i.e. size for support, not for
    # an absolute count.
    df = make_synthetic(spark, 30, hot_occurrences=100)
    blown = measure(df, "key", 100)
    blown["note"] = (
        "constant absolute threshold at 30x volume: width << N/threshold, "
        "screen admits everything, result still exact"
    )
    df.unpersist()
    out["blown_geometry"] = blown
    spark.stop()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "HEAVY_HITTERS.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
