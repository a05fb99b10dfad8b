"""Incremental datamart maintenance from a stream: ``foreachBatch`` upsert.

The reference rebuilds datamarts from scratch on a cron schedule
(``dags/datamart-collector-dag.py``); the streaming-native replacement is a
``foreachBatch`` sink that MERGEs each micro-batch into the datamart with
last-writer-wins semantics — the streaming twin of the batch q59 upsert.

``foreachBatch`` is the right seam because inside the callback the batch is
a plain DataFrame: the merge is ordinary batch code (dedup-by-key against
the current snapshot), reusing the engine's batch idioms instead of a
bespoke stateful operator.

On plain parquet the merge is read-union-rewrite with a CRASH-SAFE
directory swap: write to ``<path>.tmp-merge``, rename the live snapshot
aside to ``<path>.bak-merge``, rename the tmp into place, drop the
backup — at every crash point either the old or the new snapshot is
recoverable, and ``upsert_batch`` repairs the directory state on entry
before merging (a delete-then-rename "swap" would destroy the snapshot
if the process died between the two calls).  Local-filesystem paths only:
the os-level renames are what make the swap atomic; a cloud deployment
targets a table format (Delta/Iceberg ``MERGE INTO``) where the atomic
commit is the format's job — the callback signature is the stable
contract, the storage swap is one line.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.operators.topk import topk_per_group


def latest_per_key(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Last-writer-wins: keep each key's row with the greatest order tuple
    (total order required — include a unique id as final element).  Thin
    wrapper over ``operators.topk.topk_per_group`` so the tie/null-ordering
    contract lives in ONE place."""
    return topk_per_group(
        df, key_cols, [F.col(c).desc() for c in order_cols], k=1
    )


def upsert_batch(
    batch_df: DataFrame,
    path: str,
    key_cols: list[str],
    order_cols: list[str],
) -> None:
    """Merge one micro-batch into the parquet snapshot at ``path``.

    Crash-safe swap protocol (see module docstring): tmp is written fresh
    each call; the live dir is renamed aside before the tmp renames in, so
    no crash point loses the snapshot.  Entry first REPAIRS any state a
    previous crash left behind:

    - backup + live both present → the old crash happened after the new
      snapshot landed: drop the backup;
    - backup present, live missing → the crash happened mid-swap: restore
      the backup (the half-merged tmp is discarded; the engine replays the
      failed micro-batch from its checkpoint);
    - stale tmp → always discarded (rewritten below).
    """
    if "://" in path:
        raise ValueError(
            "upsert_batch swaps directories with local-filesystem renames; "
            f"got URI path {path!r} — point a cloud deployment at a table "
            "format (Delta/Iceberg MERGE) instead"
        )
    spark = batch_df.sparkSession
    tmp, bak = f"{path}.tmp-merge", f"{path}.bak-merge"
    if os.path.isdir(bak):
        if os.path.isdir(path):
            shutil.rmtree(bak)
        else:
            os.rename(bak, path)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)

    if os.path.isdir(path):
        current = spark.read.parquet(path)
        merged = latest_per_key(
            current.unionByName(batch_df), key_cols, order_cols
        )
    else:
        merged = latest_per_key(batch_df, key_cols, order_cols)
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(path):
        os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak, ignore_errors=True)


def run_incremental_upsert(
    stream_df: DataFrame,
    path: str,
    key_cols: list[str],
    order_cols: list[str],
    checkpoint_dir: str,
) -> None:
    """Drain ``stream_df`` (availableNow) into a last-writer-wins parquet
    snapshot at ``path`` via foreachBatch.

    Batch sizing is the SOURCE's knob: set ``maxFilesPerTrigger`` when
    building ``stream_df`` to turn one big drain into many incremental
    merges (as the checkpoint-resume test does).
    """
    q = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, _bid: upsert_batch(bdf, path, key_cols, order_cols)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
