"""CLI-job integration tests: the operational loop a reference user runs —
incremental daily snapshots with window semantics — must hold end-to-end
through the argv contract."""

from __future__ import annotations

import importlib.util
import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(job: str):
    spec = importlib.util.spec_from_file_location(job, f"{REPO}/jobs/{job}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[job] = mod
    spec.loader.exec_module(mod)
    return mod


def test_demographics_job_incremental_snapshots(spark, sf_dir, tmp_path):
    """Two runs for different dates → two date= snapshot dirs, and a
    narrower window must see at most the users of the wider one."""
    job = _load("collect_demographics_job")
    tgt = str(tmp_path / "dm")
    assert job.main(["2024-01-30", "30", sf_dir, tgt]) == 0
    assert job.main(["2024-01-15", "7", sf_dir, tgt]) == 0

    wide = spark.read.parquet(f"{tgt}/users-demographics-dm/date=2024-01-30")
    narrow = spark.read.parquet(f"{tgt}/users-demographics-dm/date=2024-01-15")
    assert wide.count() > 0 and narrow.count() > 0
    # window semantics: every user active in the 7-day window is also in
    # the 30-day window (7d ⊂ 30d for this dataset's dates)
    only_narrow = narrow.select("user_id").exceptAll(wide.select("user_id"))
    assert only_narrow.count() == 0
    # schema contract
    assert {"user_id", "act_city", "home_city", "travel_count", "travel_list", "local_ts"} <= set(
        wide.columns
    )


def test_zone_activity_job_window_filtering(spark, sf_dir, tmp_path):
    """The depth window must actually bound the weeks that appear."""
    job = _load("collect_zone_activity_job")
    tgt = str(tmp_path / "dm")
    assert job.main(["2024-01-14", "7", sf_dir, tgt]) == 0
    out = spark.read.parquet(f"{tgt}/zone-activity-dm/date=2024-01-14")
    weeks = [r["week"] for r in out.select("week").distinct().collect()]
    assert weeks, "empty rollup"
    import datetime as dt

    for w in weeks:
        assert w >= dt.datetime(2024, 1, 1)  # window start's week
        assert w <= dt.datetime(2024, 1, 14)
