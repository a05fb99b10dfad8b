"""CLI runner for streaming count-min maintenance — the frequency-state
twin of ``incremental_dedup_job.py`` (same checkpointed run-over-run
philosophy: each run sketches only the event files that arrived since the
last run into the partitioned sketch index):

    spark-submit jobs/streaming_countmin_job.py \
        <src_events_dir> <index_dir> <checkpoint_dir> [max_files_per_trigger]

- ``src_events_dir``: landing directory of event parquet files with
  (event_type STRING, user_id BIGINT) columns (extra columns ignored by
  the sketch projection).
- ``index_dir``: the partitioned sketch index (``batch_id=<epoch>/``
  parquet, depth × width count-min cell rows per group).  Count-min is
  linear, so readers merge whatever partitions exist
  (``streaming.incremental.read_countmin_index``) and get bit-for-bit
  the sketch of everything ingested; state stays depth × width cells per
  group no matter how much data arrives.
- ``checkpoint_dir``: Structured Streaming checkpoint — re-running the
  job sketches only NEW files; a crashed micro-batch overwrites its own
  ``batch_id`` partition on replay (pure append-of-own-partition, no
  earlier state read — see ``streaming.incremental.update_countmin_index``).
- ``max_files_per_trigger`` (optional): bound per-micro-batch file count.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark.session import session_scope
from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
    run_streaming_countmin,
)

USAGE = (
    "usage: streaming_countmin_job.py <src_events_dir> <index_dir> "
    "<checkpoint_dir> [max_files_per_trigger]"
)

EVENT_SCHEMA = "event_type string, user_id long"


def main(argv: list[str]) -> int:
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
        reader = spark.readStream.schema(EVENT_SCHEMA)
        if max_files is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files))
        stream = reader.parquet(src)
        run_streaming_countmin(
            stream, index_dir, ckpt, ["event_type"], "user_id"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
