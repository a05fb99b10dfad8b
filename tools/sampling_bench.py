"""Measure the stratified-sample scale claim (operators/sampling.py).

The naive exact-k-per-stratum form — ``row_number() OVER (PARTITION BY
stratum ORDER BY key)`` then ``<= k`` — shuffles the ENTIRE corpus on the
stratum key and sorts each stratum inside one task.  The shipped
oversample-trim plan filters the corpus row-locally to ~k_eff survivors
per stratum first, so only ~k_eff * |strata| rows ever reach an exchange.

Two corpus shapes, because the honest result differs:

- ``narrow`` (stratum + id only): a single-JVM shuffle of 8-byte rows is
  nearly free and an 18M-row long-sort in one task costs about as much
  as one extra md5 scan — wall is a WASH locally (that is expected; the
  naive form's cost is bandwidth + task skew, which local[32] doesn't
  price).  The shuffle BYTES still tell the scale story.
- ``payload`` (a ~256-char pseudo-random text column riding along, the
  documents-table shape): the naive window ships every payload byte
  through the exchange; the trim never moves a non-survivor payload.

Writes SAMPLING.json per shape/size: median-of-3 wall for both forms,
their exchange write bytes (UI REST stage metrics, the SHUFFLE.json
method), and an identical-output check.

Run: python tools/sampling_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_hadoop_automation_in_cloud_spark.operators import sampling
from spark_hadoop_automation_in_cloud_spark.session import (
    SessionConfig,
    get_session,
    local_master,
)

K = 100
SHAPES = {
    # (rows, with_payload): narrow isolates plan overhead; payload is the
    # documents-shaped case the sampler exists for.
    "narrow_20m": (20_000_000, False),
    "payload_4m": (4_000_000, True),
}


def corpus(spark, n: int, payload: bool):
    """~90% of rows in stratum 'big', the rest spread over 9 small ones —
    deterministic, codegen-only.  The optional payload is 8 chained md5s
    (256 pseudo-random chars) so shuffle compression can't deflate it."""
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("big"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 10).cast("string")))
        .alias("stratum"),
        F.col("id"),
    )
    if payload:
        parts = [F.md5(F.concat(F.col("id").cast("string"), F.lit(f":p{i}"))) for i in range(8)]
        df = df.withColumn("payload", F.concat(*parts))
    return df


def naive(df):
    w = Window.partitionBy("stratum").orderBy(
        sampling.sample_key(F.col("id"), ":b").asc(), F.col("id").asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= K)
        .drop("sample_rank")
    )


def trim(df):
    # stratified_sample projects down to strata+id+rank; for a fair
    # bytes/wall comparison both forms must emit the same columns
    # (payload included), so compose the same plan from its building
    # blocks and keep df's full width.
    surv = sampling.stratified_survivors(df, ["stratum"], "id", k=K, salt=":b")
    w = Window.partitionBy("stratum").orderBy(
        F.col("__skey").asc(), F.col("id").asc()
    )
    return (
        surv.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= K)
        .select(*df.columns)
    )


def shuffle_write_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE"
    with urllib.request.urlopen(url) as r:
        return sum(s.get("shuffleWriteBytes", 0) for s in json.load(r))


def timed(build, df) -> float:
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        build(df).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 3)


def main() -> None:
    spark = get_session(
        SessionConfig(
            app_name="sampling-bench",
            master=local_master(),
            shuffle_partitions=32,
            extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "20000"},
        )
    )
    out: dict = {"k": K, "skew": "90% of rows in one stratum", "shapes": {}}
    small = corpus(spark, 100_000, True)
    a, b = naive(small), trim(small)
    out["identical"] = a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    for shape, (n, payload) in SHAPES.items():
        df = corpus(spark, n, payload)
        naive(df).write.format("noop").mode("overwrite").save()  # warm JIT
        trim(df).write.format("noop").mode("overwrite").save()
        rec: dict = {"rows": n, "payload": payload}
        for label, build in [("naive", naive), ("trim", trim)]:
            b0 = shuffle_write_bytes(spark)
            rec[f"{label}_s"] = timed(build, df)
            rec[f"{label}_shuffle_mb"] = round(
                (shuffle_write_bytes(spark) - b0) / 3 / 1e6, 2
            )
        rec["speedup"] = round(rec["naive_s"] / rec["trim_s"], 2)
        rec["shuffle_ratio"] = round(
            rec["naive_shuffle_mb"] / max(rec["trim_shuffle_mb"], 0.01), 1
        )
        out["shapes"][shape] = rec
        print(shape, rec)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SAMPLING.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote SAMPLING.json")
    spark.stop()


if __name__ == "__main__":
    main()
