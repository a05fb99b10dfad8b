"""CLI runner for the training-corpus curation pipeline (quality filter →
near-dup clustering → canonical selection → token accounting; the q40
composition):

    spark-submit jobs/curate_documents_job.py \
        <date> <depth> <src_sf_dir> <tgt_path> [coords] [processed_dttm]

``date``/``depth`` are accepted for argv-contract parity with the datamart
jobs but unused — the documents table is not date-partitioned.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark.config import resolve_job_args
from spark_hadoop_automation_in_cloud_spark.io import write_datamart
from spark_hadoop_automation_in_cloud_spark.queries import q40_corpus_curation
from spark_hadoop_automation_in_cloud_spark.session import session_scope


def main(argv: list[str]) -> int:
    args = resolve_job_args(argv, "curate_documents_job")
    with session_scope() as spark:
        dm = q40_corpus_curation(spark, args.src_path)
        write_datamart(dm, args.tgt_path, "curated-documents-dm", args.date)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
