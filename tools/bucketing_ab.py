"""A/B the bucketed co-located join against the plain shuffle join,
writing BUCKETING.json at the repo root.

The bucketed layout (operators/bucketing.py, q153) claims: pay the join
shuffle ONCE at write time, then every later equi-join on the bucket key
moves ZERO shuffle bytes.  This harness measures exactly that on a
replicated corpus (documents × embeddings joined on doc_id = vec_id):

- ``plain_join``: parquet reads + SortMergeJoin — both sides exchange on
  every execution;
- ``bucketed_write``: the one-time layout cost.  Measured: its shuffle
  bytes are ZERO too — Spark's bucketBy write hash-routes rows to
  per-task bucket FILES instead of exchanging (that is why buckets are
  multi-file and the SMJ keeps its sort); the cost is wall (per-bucket
  file fan-out), not network;
- ``bucketed_join``: the catalog join over the bucketed layout — the
  per-execution cost every repeat pays.  Measured at 100x: 0 shuffle
  bytes vs the plain join's 58 MB / 700k records.

Broadcast is disabled for the joins (both sides are fact-sized in the
scenario this layout exists for; at test scale Spark would otherwise
broadcast the smaller side and hide the exchange being measured).
``breakeven_joins`` = write_wall / (plain_wall − bucketed_wall): how many
repeated joins amortize the layout.  Bytes come from the Spark UI REST
totals (the shuffle_audit method — machine-independent evidence; the
bucketed join's shuffle_write_bytes should be ~0).

Run: ``python tools/bucketing_ab.py`` (env ``SPARK_GRAFT_SF_DIR``,
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

from spark_hadoop_automation_in_cloud_spark.operators import bucketing as bk
from spark_hadoop_automation_in_cloud_spark.session import (
    SessionConfig,
    get_session,
    local_master,
)
from tools.shuffle_audit import FIELDS, stage_totals

N_BUCKETS = 32  # sized for the replicated corpus; a layout constant in prod


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale = int(os.environ.get("SPARK_GRAFT_SCALE", "10"))
    spark = get_session(
        SessionConfig(
            app_name="bucketing-ab",
            master=local_master(),
            shuffle_partitions=32,
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.retainedStages": "20000",
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            },
        )
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    scaled = f"/tmp/spark_graft_bucketing_{scale}x"
    shutil.rmtree(scaled, ignore_errors=True)
    os.makedirs(scaled)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "lang"
    )
    n = docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    # replica shift = the JOINT id span (max(id)+1 over BOTH tables, the
    # scaling_iterative span rule) so sparse/offset ids or unequal row
    # counts can never collide replicas — and the same shift on both
    # sides keeps the join keys aligned per replica
    span = max(
        docs.agg(F.max("doc_id")).first()[0],
        emb.agg(F.max("vec_id")).first()[0],
    ) + 1

    def rep(df, key):
        return (
            df.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
            .withColumn(key, F.col(key) + F.col("__rep") * span)
            .drop("__rep")
        )

    rep(docs, "doc_id").write.mode("overwrite").parquet(f"{scaled}/documents.parquet")
    rep(emb, "vec_id").write.mode("overwrite").parquet(f"{scaled}/embeddings.parquet")
    rdocs = spark.read.parquet(f"{scaled}/documents.parquet")
    remb = spark.read.parquet(f"{scaled}/embeddings.parquet")

    def probe(build, warm: bool = True) -> dict:
        if warm:
            build().write.format("noop").mode("overwrite").save()
        before = stage_totals(ui, app_id)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        after = stage_totals(ui, app_id)
        return {"wall_sec": wall} | {
            k: after[k] - before[k] for k in FIELDS
        }

    plain = probe(
        lambda: rdocs.join(remb, F.col("doc_id") == F.col("vec_id"))
    )

    # one-time write (not warmable — it IS the one-time cost; timed once)
    before = stage_totals(ui, app_id)
    t0 = time.perf_counter()
    bk.write_bucketed(rdocs, "ab_docs", f"{scaled}/bk_docs", "doc_id", N_BUCKETS)
    bk.write_bucketed(remb, "ab_emb", f"{scaled}/bk_emb", "vec_id", N_BUCKETS)
    write_wall = round(time.perf_counter() - t0, 3)
    after = stage_totals(ui, app_id)
    bwrite = {"wall_sec": write_wall} | {k: after[k] - before[k] for k in FIELDS}

    bucketed = probe(
        lambda: bk.colocated_join(spark, "ab_docs", "ab_emb", "doc_id", "vec_id")
    )

    saved = plain["wall_sec"] - bucketed["wall_sec"]
    result = {
        "sf_dir": sf_dir,
        "scale": scale,
        "rows_per_side": n * scale,
        "n_buckets": N_BUCKETS,
        "plain_join": plain,
        "bucketed_write": bwrite,
        "bucketed_join": bucketed,
        "breakeven_joins": round(bwrite["wall_sec"] / saved, 1) if saved > 0 else None,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BUCKETING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    bk.drop_table(spark, "ab_docs")
    bk.drop_table(spark, "ab_emb")
    shutil.rmtree(scaled, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
