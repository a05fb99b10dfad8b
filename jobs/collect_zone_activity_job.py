"""CLI datamart runner for the per-zone week/month activity rollup (argv
contract mirrors the reference's
``jobs/collect_events_total_cnt_agg_wk_mnth_dm_job.py:28-35``):

    spark-submit jobs/collect_zone_activity_job.py \
        <date> <depth> <src_sf_dir> <tgt_path> [coords] [processed_dttm]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark.config import resolve_job_args
from spark_hadoop_automation_in_cloud_spark.io import read_events_window, write_datamart
from spark_hadoop_automation_in_cloud_spark.plans.activity_rollup import (
    require_all_classes,
    zone_week_month_rollup,
)
from spark_hadoop_automation_in_cloud_spark.queries import EVENT_CLASSES, nearest_city_events
from spark_hadoop_automation_in_cloud_spark.session import session_scope


def main(argv: list[str]) -> int:
    args = resolve_job_args(argv, "collect_zone_activity_job")
    with session_scope() as spark:
        ez = nearest_city_events(spark, args.src_path).withColumnRenamed(
            "city_id", "zone_id"
        )
        windowed = read_events_window(ez, "ts", args.date, args.depth)
        dm = require_all_classes(
            zone_week_month_rollup(windowed, EVENT_CLASSES), EVENT_CLASSES
        )
        write_datamart(dm, args.tgt_path, "zone-activity-dm", args.date)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
