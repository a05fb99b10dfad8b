"""Parallel-efficiency receipts for the heaviest bench rows at a 3x
input (r10 VERDICT item 8): the 8-vs-32-core block in PERF_r10 showed
NOTHING parallelizes at sf0.1 (every ratio 0.47-1.41 against an ideal
~4) — which is a property of the bench scale factor, not of the plans.
This harness replicates the inputs 3x (the scaling_check.py replication
rules: shifted ids per copy — key spaces grow, per-key work stays
constant) and times the top-wall queries at 32 and at 8 cores in two
separate JVMs, writing SCALING_CORES.json.

A ratio well above 1 at 4x cores on the 3x input is the measured
parallel-efficiency evidence the local sf0.1 walls cannot provide; a
ratio still ~1 marks the row as fixed-cost-bound even at 3x and is
recorded as such (the honest alternative the verdict allowed).

Run: ``python tools/scaling_cores.py`` (env ``SPARK_GRAFT_SF_DIR``,
``SPARK_GRAFT_SCALE``; builds the replicated tables under /tmp,
spawns one subprocess per core count so each JVM sees its own
local[N]).  Like every ladder: never run a second Spark JVM alongside.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the top-5 wall rows of the r11 baseline bench (q69 7.05, q185 6.75,
#: q189 4.87, q107 4.39, q196 4.16) — the rows whose parallel efficiency
#: the verdict asked to measure rather than assume
QUERIES = [
    "q69_pagerank",
    "q185_personalized_pagerank",
    "q189_community_modularity",
    "q107_semantic_cluster_dedup",
    "q196_community_name_neardup",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from spark_hadoop_automation_in_cloud_spark import queries as q
from spark_hadoop_automation_in_cloud_spark.session import get_test_session
os.environ["SPARK_GRAFT_CPUS"] = {cpus!r}
spark = get_test_session("scaling-cores-{cpus}")
fns = {{s.name: s.fn for s in q.specs()}}
out = {{}}
for name in {queries!r}:
    fn = fns[name]
    fn(spark, {scaled!r}).write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, {scaled!r}).write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
    out[name] = sorted(samples)[1]
print("CORES_RESULT " + json.dumps(out))
spark.stop()
"""


def build_scaled(sf_dir: str, scale: int) -> str:
    """Replicate documents/events/embeddings/lineitem exactly as
    tools/scaling_check.py does (shifted ids per copy)."""
    from pyspark.sql import functions as F

    from spark_hadoop_automation_in_cloud_spark.io import TABLES, read_table
    from spark_hadoop_automation_in_cloud_spark.session import get_test_session

    scaled = f"/tmp/spark_graft_cores_{scale}x"
    shutil.rmtree(scaled, ignore_errors=True)
    os.makedirs(scaled)
    spark = get_test_session("scaling-cores-build")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = base.count()
    rep = (
        base.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * (n * scale))
        .drop("__rep")
    )
    rep.write.mode("overwrite").parquet(f"{scaled}/documents.parquet")
    ev = read_table(spark, sf_dir, "events")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    n_events = ev.agg(F.max("event_id")).first()[0] + 1
    ev_rep = (
        ev.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("user_id", F.col("user_id") + F.col("__rep") * n_users)
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * n_events)
        .drop("__rep")
    )
    ev_rep.write.mode("overwrite").parquet(f"{scaled}/events.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_rep = (
        emb.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * (n * scale))
        .drop("__rep")
    )
    emb_rep.write.mode("overwrite").parquet(f"{scaled}/embeddings.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
    n_pk = li.agg(F.max("l_partkey")).first()[0] + 1
    li_rep = (
        li.crossJoin(spark.range(scale).withColumnRenamed("id", "__rep"))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * n_ok)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("__rep") * n_pk)
        .drop("__rep")
    )
    li_rep.write.mode("overwrite").parquet(f"{scaled}/lineitem.parquet")
    for t in TABLES:
        if t not in ("documents", "events", "embeddings", "lineitem"):
            os.symlink(f"{sf_dir}/{t}.parquet", f"{scaled}/{t}.parquet")
    spark.stop()
    return scaled


def run_at(cpus: int, scaled: str) -> dict[str, float]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD.format(root=root, cpus=str(cpus), queries=QUERIES, scaled=scaled)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("CORES_RESULT "):
            return json.loads(line[len("CORES_RESULT "):])
    raise SystemExit(f"child at {cpus} cores failed:\n{out.stderr[-3000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale = int(os.environ.get("SPARK_GRAFT_SCALE", "3"))
    scaled = build_scaled(sf_dir, scale)
    t32 = run_at(32, scaled)
    t8 = run_at(8, scaled)
    result = {
        "sf_dir": sf_dir,
        "scale": scale,
        "cpus_pair": [32, 8],
        "queries": {
            name: {
                "sec_32c": t32[name],
                "sec_8c": t8[name],
                "ratio_8c_over_32c": round(t8[name] / t32[name], 2),
            }
            for name in QUERIES
        },
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALING_CORES.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
