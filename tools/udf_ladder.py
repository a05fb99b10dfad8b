"""Measure the UDF ladder: the SAME haversine expression computed three
ways over the sf0.1 event table, writing UDF_LADDER.json at the repo root.

The engine's hot paths use only rung 1; this artifact is the measured
justification (SURVEY §7.1 "UDFs are the slow path"):

1. built-in column expressions — whole-stage codegen, JVM-side;
2. Arrow-vectorized ``@pandas_udf`` — one Python process round-trip per
   batch, numpy math inside;
3. row-at-a-time Python UDF — one serialized call per ROW (the
   anti-pattern; present here only to measure it, never used in the
   engine).

Run: ``python tools/udf_ladder.py`` (env ``SPARK_GRAFT_SF_DIR`` to point
elsewhere).  Timings are best-of-2 full materializations into a noop sink.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from spark_hadoop_automation_in_cloud_spark.functions.geo import haversine_km
from spark_hadoop_automation_in_cloud_spark.queries import geo_events
from spark_hadoop_automation_in_cloud_spark.session import get_test_session

ANCHOR_LAT, ANCHOR_LON = 55.75, 37.62
R = 6371.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_test_session("udf-ladder")
    # 200x in-plan fanout: at sf0.1 the raw table is only 100k rows, where
    # scan+sink overhead hides the per-row cost being measured; 20M rows
    # puts every variant in its compute-bound regime
    base = (
        geo_events(spark, sf_dir)
        .select("event_id", "lat", "lon")
        .withColumn("__rep", F.explode(F.sequence(F.lit(1), F.lit(200))))
        .drop("__rep")
    )

    # UDFs defined after session start: return-type DDL parsing needs an
    # active session on Spark 4
    @pandas_udf("double")
    def haversine_pandas(lat: pd.Series, lon: pd.Series) -> pd.Series:
        import numpy as np

        dlat = np.radians(ANCHOR_LAT - lat)
        dlon = np.radians(ANCHOR_LON - lon)
        a = (
            np.sin(dlat / 2) ** 2
            + np.cos(np.radians(lat))
            * np.cos(np.radians(ANCHOR_LAT))
            * np.sin(dlon / 2) ** 2
        )
        return 2 * R * np.arcsin(np.sqrt(a))

    @udf("double")
    def haversine_row(lat: float, lon: float) -> float:
        dlat = math.radians(ANCHOR_LAT - lat)
        dlon = math.radians(ANCHOR_LON - lon)
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(math.radians(lat))
            * math.cos(math.radians(ANCHOR_LAT))
            * math.sin(dlon / 2) ** 2
        )
        return 2 * R * math.asin(math.sqrt(a))

    variants = {
        "builtin_codegen": lambda df: df.select(
            haversine_km(
                F.col("lat"), F.col("lon"), F.lit(ANCHOR_LAT), F.lit(ANCHOR_LON)
            ).alias("km")
        ),
        "pandas_udf_arrow": lambda df: df.select(
            haversine_pandas("lat", "lon").alias("km")
        ),
        "python_row_udf": lambda df: df.select(
            haversine_row("lat", "lon").alias("km")
        ),
    }

    # warmup each plan family once
    for build in variants.values():
        build(base).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name, build in variants.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            build(base).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)

    n = base.count()
    result = {
        "rows": n,
        "sf_dir": sf_dir,
        "seconds_best_of_2": out,
        "slowdown_vs_builtin": {
            k: round(v / out["builtin_codegen"], 1) for k, v in out.items()
        },
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "UDF_LADDER.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
