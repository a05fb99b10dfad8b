"""Measure the bloom semi-join prune on real keys at sf0.1, writing
BLOOM.json at the repo root: design vs measured false-positive rate,
prune selectivity, and build/probe wall times.

The design rate is (1 - e^(-kn/m))^k with n = |dim keys|; the measured
rate is false positives / non-matching probed keys.  Correctness (no
false negatives) is pinned separately in tests/test_operators.py — this
artifact documents the OPERATING POINT: how much fact the filter removes
before any shuffle, at what per-row cost.

Run: ``python tools/bloom_fpp.py`` (env ``SPARK_GRAFT_SF_DIR``).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.io import read_table
from spark_hadoop_automation_in_cloud_spark.operators.bloom import (
    BLOOM_BITS,
    BLOOM_HASHES,
    build_bloom,
    might_contain,
)
from spark_hadoop_automation_in_cloud_spark.session import get_test_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_test_session("bloom-fpp")
    li = read_table(spark, sf_dir, "lineitem")
    o = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li.count()
    n_keys = o.distinct().count()

    t0 = time.perf_counter()
    words = build_bloom(o, "o_orderkey")
    build_s = time.perf_counter() - t0

    probe = might_contain(F.col("l_orderkey"), words)
    pruned = li.where(probe)
    pruned.count()  # warm
    t0 = time.perf_counter()
    n_kept = pruned.count()
    probe_s = time.perf_counter() - t0

    n_fact = li.count()
    matched = li.join(
        o.withColumnRenamed("o_orderkey", "l_orderkey").distinct(), "l_orderkey"
    )
    n_match = matched.count()
    # measured fpp over DISTINCT non-matching fact keys (the per-key rate
    # the design formula predicts)
    fact_keys = li.select("l_orderkey").distinct()
    nonmatch_keys = fact_keys.join(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_anti"
    )
    n_nonmatch = nonmatch_keys.count()
    n_fp = nonmatch_keys.where(might_contain(F.col("l_orderkey"), words)).count()

    design_fpp = (1 - math.exp(-BLOOM_HASHES * n_keys / BLOOM_BITS)) ** BLOOM_HASHES
    out = {
        "sf_dir": sf_dir,
        "geometry": {"num_bits": BLOOM_BITS, "num_hashes": BLOOM_HASHES},
        "n_dim_keys": n_keys,
        "n_fact_rows": n_fact,
        "n_matching_rows": n_match,
        "n_kept_rows": n_kept,
        "prune_selectivity": round(n_kept / n_fact, 4),
        "design_fpp": round(design_fpp, 8),
        "measured_fpp": round(n_fp / max(n_nonmatch, 1), 8),
        "n_nonmatch_keys": n_nonmatch,
        "n_false_positive_keys": n_fp,
        "build_sec": round(build_s, 3),
        "probe_full_scan_sec": round(probe_s, 3),
        # reuse the already-built filter and pruned frame — bloom_prune
        # here would rebuild the words and rescan lineitem for nothing
        "no_false_negatives": bool(
            pruned.join(
                o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
            ).count()
            == n_match
        ),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BLOOM.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
