"""A/B the PQ asymmetric-distance scan against the full-vector cosine
scan, writing PQ_AB.json at the repo root.

The PQ claim (q156/q157): once vectors are codes, the search-time scan
reads n_sub small ints per row instead of a dim-float vector — a storage
and IO reduction that compounds with corpus size.  This harness measures
exactly that on a replicated corpus, both sides answering the SAME
top-k query batch from parquet:

- ``vector_scan``: brute cosine top-k over the vector parquet (q24's
  broadcast-queries shape — the exact baseline);
- ``adc_scan``: ADC top-k over the coded parquet (q157's shape; same
  queries, LUTs from the trained codebooks).

Recorded per side: wall (median of 3), parquet bytes on disk, and the
scan's inputBytes from the UI REST stage totals (the shuffle_audit
method — machine-independent).  ADC is approximate (RECALL.json records
the recall trade separately); THIS artifact records the cost side.

Run: ``python tools/pq_scan_ab.py`` (env ``SPARK_GRAFT_SF_DIR``,
``SPARK_GRAFT_SCALE`` default 10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.operators.similarity import (
    cosine_topk,
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)
from spark_hadoop_automation_in_cloud_spark.session import (
    SessionConfig,
    get_session,
    local_master,
)
from tools.shuffle_audit import FIELDS, stage_totals


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale = int(os.environ.get("SPARK_GRAFT_SCALE", "10"))
    spark = get_session(
        SessionConfig(
            app_name="pq-scan-ab",
            master=local_master(),
            shuffle_partitions=32,
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.retainedStages": "20000",
            },
        )
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    work = f"/tmp/spark_graft_pq_ab_{scale}x"
    shutil.rmtree(work, ignore_errors=True)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    span = emb.agg(F.max("vec_id")).first()[0] + 1
    rep = (
        emb.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * span)
        .drop("__rep")
    )
    rep.write.mode("overwrite").parquet(f"{work}/vectors")
    vectors = spark.read.parquet(f"{work}/vectors")
    books = train_pq_codebooks(vectors)
    pq_encode(vectors, books).drop("recon_sq").write.mode("overwrite").parquet(
        f"{work}/codes"
    )
    codes = spark.read.parquet(f"{work}/codes")
    queries = vectors.where(F.col("vec_id") < 5)

    def probe(build) -> dict:
        build().write.format("noop").mode("overwrite").save()  # warm
        walls, deltas = [], None
        for _ in range(3):
            before = stage_totals(ui, app_id)
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            after = stage_totals(ui, app_id)
            deltas = {k: after[k] - before[k] for k in FIELDS}
        return {"wall_sec_median": sorted(walls)[1]} | deltas

    vec = probe(lambda: cosine_topk(vectors, queries, k=10))
    adc = probe(lambda: pq_adc_topk(codes, books, queries, k=10))
    vec["parquet_bytes"] = dir_bytes(f"{work}/vectors")
    adc["parquet_bytes"] = dir_bytes(f"{work}/codes")

    result = {
        "sf_dir": sf_dir,
        "scale": scale,
        "n_vectors": vectors.count(),
        "vector_scan": vec,
        "adc_scan": adc,
        # the two ratios that matter: what the index COSTS to hold
        # (parquet bytes — 11x at 10x here) and what a query batch costs
        # to answer (wall).  The REST inputBytes deltas are kept raw but
        # sit in scan-metadata noise at this corpus size — read
        # parquet_bytes for the IO story.
        "storage_bytes_ratio": round(
            vec["parquet_bytes"] / adc["parquet_bytes"], 2
        ),
        "wall_ratio": round(
            vec["wall_sec_median"] / max(adc["wall_sec_median"], 1e-9), 2
        ),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PQ_AB.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
