"""CLI runner for distributed BPE merge training + tokenizer-fit report
(the batch twin of the curation jobs: read a documents table, write the
learned artifacts):

    spark-submit jobs/train_tokenizer_job.py \
        <docs_parquet> <out_dir> [n_merges]

- ``docs_parquet``: parquet path with (doc_id BIGINT, text STRING,
  source STRING) columns (extra columns ignored).
- ``out_dir``: receives two artifacts —
  ``merges.parquet``: the ordered merge table (step, lhs, rhs, merged,
  pair_count) learned by ``operators.bpe.bpe_merges`` (the exact greedy
  frequency-argmax; one corpus-sized shuffle, then vocab-sized rounds);
  ``fit_by_source.parquet``: per-source compression under those merges
  (``operators.bpe.segmentation_stats``) — the mixture-decision report.
- ``n_merges`` (optional, default 8): merge rounds; the merge table is
  the driver-bounded model state (one row per round).

Reference parity: the reference's jobs are thin CLI shells over its
collector (src/spark/collector.py run via jobs/*.py) — this follows the
same shape for the tokenizer-training artifact a training-data pipeline
ships alongside its curated corpus.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark.operators.bpe import (
    bpe_merges,
    segmentation_stats,
)
from spark_hadoop_automation_in_cloud_spark.session import session_scope

USAGE = "usage: train_tokenizer_job.py <docs_parquet> <out_dir> [n_merges]"


def main(argv: list[str]) -> int:
    if not 2 <= len(argv) <= 3:
        print(USAGE, file=sys.stderr)
        return 2
    docs_path, out_dir = argv[:2]
    n_merges = 8
    if len(argv) == 3:
        try:
            n_merges = int(argv[2])
        except ValueError:
            print(USAGE, file=sys.stderr)
            return 2
        if n_merges < 1:
            print(USAGE, file=sys.stderr)
            return 2
    with session_scope() as spark:
        docs = spark.read.parquet(docs_path)
        merges = bpe_merges(docs, "text", n_merges=n_merges)
        merges.write.mode("overwrite").parquet(f"{out_dir}/merges.parquet")
        rules = [
            (r["lhs"], r["rhs"])
            for r in sorted(merges.collect(), key=lambda r: r["step"])
        ]
        segmentation_stats(docs, ["source"], "text", rules).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/fit_by_source.parquet")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
