"""Shuffle-byte accounting for every bench headline query, writing
SHUFFLE.json at the repo root.

Wall-clock numbers drift with the machine (BENCH machine_factor exists
precisely to correct for that); BYTES do not.  The 100 TB cost driver is
shuffle volume, so this harness records, per headline query at the bench
sf, the exchange bytes/records actually moved — machine-independent
evidence for the repo's shuffle-shape claims (e.g. "the fact side never
shuffles" for the broadcast 1-NN family, "one batch shuffle reused by
the probe" for incremental dedup, "sketch rollups touch sketch rows,
never facts").  A plan regression that re-introduces a fact-side
exchange shows up here as a bytes jump even on a faster machine, where
a wall-time gate would read it as an improvement.

Method: run each query once with the Spark UI's REST API enabled and
diff the cumulative COMPLETE-stage totals around it (skipped stages —
reused exchanges — never enter the totals).  Bytes are deterministic
for a fixed plan + data, so one run suffices; `spark.ui.retainedStages`
is raised so cumulative sums never lose evicted stages mid-run.

CAVEAT — the `input_bytes` column is NOT parquet scan volume on this
local-filesystem setup: Spark's stage inputBytes comes from Hadoop
FileSystem statistics, which barely register local parquet reads (a
plain scan of the 594 KB sf0.1 documents file reports 3,438 bytes —
measured r14; footer/metadata only).  What the column does capture is
CACHED-BLOCK read traffic (reading a persisted partition counts via
the same input metric), so persist-heavy queries (q202's GD rounds over
the persisted feature frame) report large "input" while pure-scan
queries report near zero.  Treat it as a cache-traffic diagnostic; the
shuffle columns are the artifact's claim, and scan volume at scale is
covered by SHUFFLE_SLOPE.json's oracle-derived data_ratio denominators.

Run: ``python tools/shuffle_audit.py`` (env ``SPARK_GRAFT_SF_DIR``).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark import queries as q
from spark_hadoop_automation_in_cloud_spark.session import (
    SessionConfig,
    get_session,
    local_master,
)

FIELDS = {
    "shuffle_write_bytes": "shuffleWriteBytes",
    "shuffle_write_records": "shuffleWriteRecords",
    "shuffle_read_bytes": "shuffleReadBytes",
    "input_bytes": "inputBytes",
    # spill accounting: non-zero means a partition outgrew execution
    # memory and hit the sort-spill path — the per-executor sizing claim
    # ("partitions fit in memory at the bench sf") made measurable.
    "memory_spill_bytes": "memoryBytesSpilled",
    "disk_spill_bytes": "diskBytesSpilled",
}


def stage_totals(ui: str, app_id: str) -> dict[str, int]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return {k: sum(s.get(v, 0) for s in stages) for k, v in FIELDS.items()}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    spark = get_session(
        SessionConfig(
            app_name="shuffle-audit",
            master=local_master(),
            shuffle_partitions=32,
            extra_conf={
                "spark.driver.memory": os.environ.get(
                    "SPARK_GRAFT_DRIVER_MEM", "8g"
                ),
                "spark.ui.enabled": "true",
                "spark.ui.retainedStages": "20000",
                "spark.sql.shuffle.partitions": "32",
            },
        )
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    fns = {s.name: s.fn for s in q.specs()}

    # laddered-but-not-benched rows that still need shuffle receipts
    # (r07 verdict item 5: the graph family; q180/q188 share q161/q186's
    # graph but not their bench slots; r10 adds the tokenizer/funnel
    # rows registered this round — q200's receipt vs q194's shows the
    # sampled-training delta, q201's shows the composition tax over its
    # constituent stages)
    extra = [
        "q180_clustering_coefficient",
        "q188_copurchase_communities",
        "q198_distilled_filter_rates",
        "q199_bpe_decode_roundtrip",
        "q200_sampled_bpe_token_ids",
        "q201_curated_mix_funnel",
        "q205_learned_mix_funnel",
        "q206_mixture_epochs",
    ]
    out: dict[str, dict[str, int]] = {}
    for name in bench.HEADLINE + extra:
        before = stage_totals(ui, app_id)
        fns[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        after = stage_totals(ui, app_id)
        out[name] = {k: after[k] - before[k] for k in FIELDS}

    result = {"sf_dir": sf_dir, "queries": out}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # The standing artifact stays SHUFFLE.json for the bench sf (0.1);
    # other scales get a suffixed file (same convention as the scaling
    # tools: never clobber the standing artifact with an off-scale run)
    # so sf-pair slope analysis (tools/shuffle_slope.py) can read both.
    base = os.path.basename(os.path.normpath(sf_dir))
    fname = "SHUFFLE.json" if base == "sf0.1" else f"SHUFFLE_{base}.json"
    with open(os.path.join(root, fname), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
