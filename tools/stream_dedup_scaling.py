"""Per-batch cost of streaming dedup-on-arrival as the fingerprint index
grows, writing STREAM_DEDUP.json at the repo root.

The 100 TB question for dedup-on-arrival is not throughput of one batch —
it is whether batch N's cost stays ~flat as the admitted index grows.
The anti-join probe must read the index (that is the semantics of exact
dedup), so the expected shape is cost(batch) ≈ O(|batch| + |index|) with
a SMALL index constant: the index carries one ~50-byte row per distinct
document ever admitted — petabytes of corpus collapse to a table orders
of magnitude smaller, and at scale it is bucketed by content_hash so the
probe shuffles only the batch side.  This harness feeds equal-size
batches (50% fresh / 50% duplicate content) through the real
foreachBatch body and records each batch's wall time; the verdict is the
late/early per-batch ratio.

Run: ``python tools/stream_dedup_scaling.py`` (env ``SPARK_GRAFT_SF_DIR``,
``SPARK_GRAFT_N_BATCHES``; state under /tmp).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.session import get_test_session
from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
    dedup_batch_against_index,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_batches = int(os.environ.get("SPARK_GRAFT_N_BATCHES", "8"))
    spark = get_test_session("stream-dedup-scaling")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.count()

    idx = "/tmp/spark_graft_stream_dedup_idx"
    shutil.rmtree(idx, ignore_errors=True)
    walls = []
    for b in range(n_batches):
        # batch b: every doc re-keyed into a fresh id range; half the batch
        # re-tags PRIOR content (dup against the index), half is fresh
        # (salted text) — the steady-state mix of a real crawl
        fresh = docs.select(
            (F.col("doc_id") + F.lit(b * 2 * n)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" batch{b}")).alias("text"),
        )
        dup_src = max(0, b - 1)
        dups = docs.select(
            (F.col("doc_id") + F.lit((b * 2 + 1) * n)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" batch{dup_src}")).alias("text"),
        )
        batch = fresh.unionByName(dups).persist()
        batch.count()  # materialize inputs outside the timed region
        t0 = time.perf_counter()
        dedup_batch_against_index(batch, idx, "doc_id", "text", b)
        walls.append(round(time.perf_counter() - t0, 3))
        batch.unpersist()

    index_rows = spark.read.parquet(idx).count()
    if n_batches < 4:
        raise SystemExit("need SPARK_GRAFT_N_BATCHES >= 4 for the early/late comparison")
    early = sum(walls[1:3]) / 2  # batch 0 pays JVM warmup
    late = sum(walls[-2:]) / 2
    out = {
        "sf_dir": sf_dir,
        "n_docs_per_batch": 2 * n,
        "n_batches": n_batches,
        "index_rows_final": index_rows,
        "per_batch_sec": walls,
        "early_avg_sec": round(early, 3),
        "late_avg_sec": round(late, 3),
        "late_over_early": round(late / early, 2),
        "flat": late / early < 2.0,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the 8-batch run is the standing artifact; deeper horizons get their
    # own files (same convention as the scaling_check/scaling_iterative
    # scale suffixes)
    name = (
        "STREAM_DEDUP.json"
        if n_batches == 8
        else f"STREAM_DEDUP_{n_batches}b.json"
    )
    with open(os.path.join(root, name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
