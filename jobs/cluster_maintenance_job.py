"""CLI runner for incremental near-dup cluster maintenance — the graph
sibling of ``incremental_dedup_job.py`` (that job maintains the
exact-dedup fingerprint index; this one maintains the near-dup CLUSTER
labels against a persisted MinHash band index):

    spark-submit jobs/cluster_maintenance_job.py \
        <new_docs_parquet> <state_dir> [min_est_jaccard]

- ``new_docs_parquet``: the newly arrived batch, parquet with
  (doc_id BIGINT, text STRING) columns.
- ``state_dir``: the maintained state —
  ``band_index/ingest=<token>/`` (append-only MinHash band rows per
  batch) and ``labels/`` (the full-coverage min-id cluster label table,
  swap-rewritten per round with the crash-safe rename protocol).
- ``min_est_jaccard`` (optional, default 0.5): the LSH estimated-Jaccard
  threshold a band collision must clear to become a cluster edge.

Each run pays its own batch, never the corpus: pairs come from
batch-vs-index + within-batch band equi-joins
(``operators.dedup.incremental_lsh_pairs``), the label merge runs CC on
the reduced graph only (``operators.components.incremental_components``),
and the history is touched by one broadcast remap pass.  Replays are
no-ops and every crash point repairs on the next run — see
``streaming.incremental.maintain_neardup_clusters`` for the protocol and
tests/test_streaming.py for the multi-batch ≡ full-recompute proof.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark.session import session_scope
from spark_hadoop_automation_in_cloud_spark.streaming.incremental import (
    maintain_neardup_clusters,
)

USAGE = (
    "usage: cluster_maintenance_job.py <new_docs_parquet> <state_dir> "
    "[min_est_jaccard]"
)


def main(argv: list[str]) -> int:
    if not 2 <= len(argv) <= 3:
        print(USAGE, file=sys.stderr)
        return 2
    new_docs_path, state_dir = argv[0], argv[1]
    try:
        threshold = float(argv[2]) if len(argv) == 3 else 0.5
    except ValueError:
        print(f"min_est_jaccard must be a float, got {argv[2]!r}", file=sys.stderr)
        return 2
    if not 0.0 <= threshold <= 1.0:
        print(f"min_est_jaccard must be in [0, 1], got {threshold}", file=sys.stderr)
        return 2
    with session_scope() as spark:
        batch = spark.read.parquet(new_docs_path)
        labels = maintain_neardup_clusters(spark, batch, state_dir, threshold)
        n_labels = labels.count()
        n_clusters = labels.select("cluster_id").distinct().count()
    print(
        f"cluster maintenance round complete: {n_labels} labeled docs in "
        f"{n_clusters} clusters under {state_dir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
