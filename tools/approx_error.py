"""Quantify the approximate aggregates against their exact counterparts at
sf0.1, writing APPROX_ERROR.json at the repo root (same measured-artifact
discipline as RECALL.json and UDF_LADDER.json: an "approximate" claim in
this engine always ships with its measured error).

- ``approx_count_distinct`` (HyperLogLog++, default rsd 5%) vs exact
  COUNT(DISTINCT) over columns spanning three cardinality regimes
  (150 / 10k / 15k).
- ``approx_percentile`` (default accuracy 10000) vs exact ``percentile``
  at p50/p90/p99.

Run: ``python tools/approx_error.py``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.io import read_table
from spark_hadoop_automation_in_cloud_spark.session import get_test_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_test_session("approx-error")

    out: dict[str, dict] = {"approx_count_distinct": {}, "approx_percentile": {}}

    for table, col in [
        ("events", "user_id"),
        ("events", "event_id"),
        ("orders", "o_custkey"),
    ]:
        df = read_table(spark, sf_dir, table)
        row = df.agg(
            F.count_distinct(col).alias("exact"),
            F.approx_count_distinct(col).alias("approx"),
        ).first()
        out["approx_count_distinct"][f"{table}.{col}"] = {
            "exact": row["exact"],
            "approx": row["approx"],
            "rel_error": round(abs(row["approx"] - row["exact"]) / row["exact"], 5),
        }

    o = read_table(spark, sf_dir, "orders")
    row = o.agg(
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("exact"),
        F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("approx"),
    ).first()
    for p, ex, ap in zip(("p50", "p90", "p99"), row["exact"], row["approx"]):
        out["approx_percentile"][p] = {
            "exact": round(ex, 2),
            "approx": round(ap, 2),
            "rel_error": round(abs(ap - ex) / ex, 6),
        }

    result = {"sf_dir": sf_dir, **out}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "APPROX_ERROR.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
