"""CLI runner for streaming dedup-on-arrival — the incremental-ingest
twin of the reference's windowed batch jobs (each run processes only the
document files that arrived since the last run, the same ``depth``-window
philosophy as ``src/keeper/keeper.py:10-56``, carried by a Structured
Streaming checkpoint instead of date arithmetic):

    spark-submit jobs/incremental_dedup_job.py \
        <src_docs_dir> <index_dir> <checkpoint_dir> [max_files_per_trigger] \
        [--compact]

- ``src_docs_dir``: landing directory of document parquet files with
  (doc_id BIGINT, text STRING) columns.
- ``index_dir``: the partitioned fingerprint index
  (``batch_id=<epoch>/`` parquet, one row per first-seen content hash:
  content_hash, canonical_id).  The index doubles as the survivor store —
  downstream consumers read it directly; earlier epochs are never
  rewritten.
- ``checkpoint_dir``: Structured Streaming checkpoint — re-running the
  job dedups only NEW files against everything already admitted, without
  rescanning the corpus (the 100 TB run-over-run contract of
  ``operators.dedup.incremental_dedup``).
- ``max_files_per_trigger`` (optional): bound per-micro-batch file count.
- ``--compact`` (optional): after the drain, collapse all committed epoch
  partitions into one (``streaming.incremental.compact_dedup_index``) —
  the cron-cadence maintenance that keeps a years-old index from
  accumulating thousands of tiny ``batch_id=`` directories.  Safe here by
  construction: the drain has fully committed every epoch below the next
  one when the query terminates.

Replay-safe on plain parquet: a crashed micro-batch recomputes its own
``batch_id`` partition from ``batch_id < epoch`` state and overwrites it
(see ``streaming.incremental.dedup_batch_against_index``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark.session import session_scope
from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
    compact_dedup_index,
    run_streaming_incremental_dedup,
)

USAGE = (
    "usage: incremental_dedup_job.py <src_docs_dir> <index_dir> "
    "<checkpoint_dir> [max_files_per_trigger] [--compact]"
)

DOC_SCHEMA = "doc_id long, text string"


def main(argv: list[str]) -> int:
    compact = "--compact" in argv
    argv = [a for a in argv if a != "--compact"]
    if not 3 <= len(argv) <= 4:
        print(USAGE, file=sys.stderr)
        return 2
    src, index_dir, ckpt = argv[:3]
    max_files = None
    if len(argv) == 4:
        try:
            max_files = int(argv[3])
        except ValueError:
            print(USAGE, file=sys.stderr)
            return 2
        if max_files < 1:  # 0 would silently mean "unbounded" — reject
            print(USAGE, file=sys.stderr)
            return 2
    with session_scope() as spark:
        reader = spark.readStream.schema(DOC_SCHEMA)
        if max_files is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files))
        stream = reader.parquet(src)
        run_streaming_incremental_dedup(stream, index_dir, ckpt, "doc_id", "text")
        if compact and os.path.isdir(index_dir):
            epochs = [
                int(d.split("=", 1)[1])
                for d in os.listdir(index_dir)
                if d.startswith("batch_id=")
            ]
            if epochs:
                # every epoch on disk is committed once the availableNow
                # drain has terminated, so the whole index may collapse
                compact_dedup_index(spark, index_dir, upto_epoch=max(epochs) + 1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
