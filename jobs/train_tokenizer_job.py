"""CLI runner for distributed BPE merge training + tokenizer-fit report
(the batch twin of the curation jobs: read a documents table, write the
learned artifacts), plus the apply side — encode a corpus to token-id
arrays under a persisted merge table:

    spark-submit jobs/train_tokenizer_job.py \
        <docs_parquet> <out_dir> [n_merges] [sample_mod]

    spark-submit jobs/train_tokenizer_job.py encode \
        <docs_parquet> <merges_parquet> <out_dir>

Train mode:
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
- ``sample_mod`` (optional, default 1 = full vocabulary): train the
  rules on a deterministic 1/``sample_mod`` hash-slice of the
  word-frequency table (``operators.bpe.bpe_merges_sampled``) — the
  production shape for realistic merge counts, where per-round cost is
  the wall and the sample divides it (BPE_LADDER.json).  The fit report
  still scores the FULL corpus under the sampled rules — exactly the
  readout that says whether the sample was too thin.

Encode mode (the production artifact a trainer consumes):
- ``merges_parquet``: a train-mode ``merges.parquet`` (or any table with
  step/lhs/rhs columns — applied in step order);
- ``out_dir``: receives (doc_id BIGINT, n_tokens BIGINT, token_ids
  ARRAY<INT>) parquet via ``operators.bpe.bpe_encode`` — vocab-sized
  merge folds, one corpus word join, deterministic printable-ASCII +
  merge-order ids (``token_id_map``); this is what q195 packs into
  fixed-capacity bins.

Reference parity: the reference's jobs are thin CLI shells over its
collector (src/spark/collector.py run via jobs/*.py) — this follows the
same shape for the tokenizer artifacts a training-data pipeline ships
alongside its curated corpus.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark.operators.bpe import (
    bpe_encode,
    bpe_merges,
    bpe_merges_sampled,
    segmentation_stats,
)
from spark_hadoop_automation_in_cloud_spark.session import session_scope

USAGE = (
    "usage: train_tokenizer_job.py <docs_parquet> <out_dir> [n_merges]"
    " [sample_mod]\n"
    "       train_tokenizer_job.py encode <docs_parquet> <merges_parquet> <out_dir>"
)


def _encode(argv: list[str]) -> int:
    if len(argv) != 3:
        print(USAGE, file=sys.stderr)
        return 2
    docs_path, merges_path, out_dir = argv
    with session_scope() as spark:
        docs = spark.read.parquet(docs_path)
        merges = spark.read.parquet(merges_path)
        rules = [
            (r["lhs"], r["rhs"])
            for r in sorted(merges.collect(), key=lambda r: r["step"])
        ]
        bpe_encode(docs, "doc_id", "text", rules).write.mode(
            "overwrite"
        ).parquet(out_dir)
    return 0


def main(argv: list[str]) -> int:
    if argv and argv[0] == "encode":
        return _encode(argv[1:])
    if not 2 <= len(argv) <= 4:
        print(USAGE, file=sys.stderr)
        return 2
    docs_path, out_dir = argv[:2]
    n_merges, sample_mod = 8, 1
    try:
        if len(argv) >= 3:
            n_merges = int(argv[2])
        if len(argv) == 4:
            sample_mod = int(argv[3])
    except ValueError:
        print(USAGE, file=sys.stderr)
        return 2
    if n_merges < 1 or sample_mod < 1:
        print(USAGE, file=sys.stderr)
        return 2
    with session_scope() as spark:
        docs = spark.read.parquet(docs_path)
        merges = (
            bpe_merges(docs, "text", n_merges=n_merges)
            if sample_mod == 1
            else bpe_merges_sampled(
                docs, "text", n_merges=n_merges, sample_mod=sample_mod
            )
        )
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
