"""Shuffle-byte GROWTH slope per headline query across two scale
factors, writing SHUFFLE_SLOPE.json at the repo root.

SHUFFLE.json proves the shuffle *shape* at one scale; this tool proves
the shuffle *trend*: for each headline query, the ratio of exchange
bytes between two sf runs (default sf0.01 -> sf0.1, a ~10x data
growth).  A query whose shuffle bytes grow at or below its input growth
is shuffle-linear or better; a super-linear ratio is the 100 TB red
flag (a pair blowup, a fan-out join, an accidental re-partition) that
wall-clock timing on a 32-core box cannot surface.  Bytes are
deterministic for a fixed plan + data, so the comparison is
machine-independent — the same lens bench.py's machine_factor applies
to time, applied to the quantity that actually prices a 1000-executor
run.

Denominator choice: the REST API's stage ``inputBytes`` under-reports
small fast scans (the vectorized parquet reader's byte counter polls
every 1000 rows; a 2 MB single-row-group scan that finishes in one
task beat reports ~5 KB), so the honest per-query data-growth anchor
is the ON-DISK size ratio of the tables the query actually reads.
Those tables are recovered from the query's own DuckDB oracle SQL
(word-boundary match over the ten registered view names) — the oracle
is required to read exactly what the Spark kernel reads, so it doubles
as the input manifest.  The raw REST ratio is still published as
``input_ratio_rest`` for the scan-heavy queries where it is meaningful
(iterative operators re-scanning per round report real volumes).

Interpretation baked into the output:
- ``slope = shuffle_ratio / data_ratio``: <= ~1.0 means shuffle volume
  grows no faster than the query's own input — the property that keeps
  a plan alive at 100 TB.
- ``small_at_both_sf``: below 64 KB of absolute shuffle at BOTH scales
  the ratio is bookkeeping noise (bounded state: sketches, dims, bloom
  words, final single-digit-row aggregates), not a scaling signal.

Run AFTER producing both inputs:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/shuffle_audit.py
  python tools/shuffle_audit.py            # default sf0.1 -> SHUFFLE.json
  python tools/shuffle_slope.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark import queries as q

#: below this many absolute shuffle bytes at BOTH scales the ratio is
#: bookkeeping noise (a handful of 32-partition exchange headers), not a
#: scaling signal.
SMALL_BYTES = 64 * 1024

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def tables_of(name: str, sql_by_name: dict[str, str | None]) -> list[str]:
    """Input tables of a registered query, recovered from its oracle SQL."""
    sql = sql_by_name.get(name) or ""
    found = [t for t in TABLES if re.search(rf"\b{t}\b", sql)]
    # every registered oracle reads at least one view; an empty hit means
    # the manifest heuristic broke — fall back to "all tables" (worst-case
    # denominator, biases slope UP, never hides a regression).
    return found or list(TABLES)


def dir_bytes(sf_dir: str, tables: list[str]) -> int:
    return sum(
        os.path.getsize(os.path.join(sf_dir, f"{t}.parquet")) for t in tables
    )


def derived_ratios(lo_dir: str, hi_dir: str) -> dict[str, dict]:
    """True-input growth for queries whose working set is DERIVED from a
    table rather than the table itself, where the on-disk ratio is the
    wrong denominator.  q69's graph is pairs-of-users-sharing-a-purchase-
    key: the testdata generator holds the key space fixed, so users per
    key — and hence edges — grow ~quadratically with sf (measured ~102x
    edges for ~9.3x event bytes).  Judging q69's shuffle against event
    bytes would misread a sublinear-in-edges plan as a 6x blowup.
    Counted in DuckDB (exact, engine-independent)."""
    import duckdb

    con = duckdb.connect()
    counts = {}
    for tag, d in (("lo", lo_dir), ("hi", hi_dir)):
        counts[tag] = con.sql(
            f"""
            WITH p AS (
              SELECT DISTINCT CAST(json_extract_string(props, '$.k') AS INT) k,
                     user_id
              FROM '{os.path.join(d, "events.parquet")}'
              WHERE event_type = 'purchase')
            SELECT count(*) FROM (
              SELECT DISTINCT a.user_id, b.user_id
              FROM p a JOIN p b USING (k) WHERE a.user_id <> b.user_id)
            """
        ).fetchone()[0]
    contact = {
        "derived_input": "contact-graph edges",
        "derived_lo": counts["lo"],
        "derived_hi": counts["hi"],
        "derived_ratio": round(counts["hi"] / counts["lo"], 3),
    }
    # The co-purchase graph family (q161/q180/q186/q188) deliberately has
    # NO derived override: its recurring-pair edge set barely grows with
    # sf in this generator (support >= 2 DISTINCT orders; measured 1.04x
    # edges for 10.4x lineitem bytes), so the dominant shuffle in those
    # queries is the EDGE-DERIVATION basket self-join, which tracks
    # lineitem — the right denominator IS the table ratio, and a
    # 1.04x-edges denominator would misread a scan-linear plan as a
    # 10x blowup.  The graph-PHASE shuffle component is bounded by the
    # edge set (flat here), which the NOTES entries record.
    return {
        "q69_pagerank": contact,
        # q185 personalizes the SAME contact graph (seed teleport adds a
        # 1-row aggregate, no new input)
        "q185_personalized_pagerank": contact,
    }


#: regime annotations for slopes the table ratio alone can't explain.
NOTES = {
    "q60_decontamination": (
        "join fan-out is sum over shingles of min(train_df, cap) * "
        "min(test_df, cap); between sf0.01 and sf0.1 document frequencies "
        "are still BELOW the caps, so candidate volume grows with df — "
        "once df crosses the caps the bound takes over and growth turns "
        "linear-in-corpus (SCALING_30x/SCALING_100x: 30x input -> 4.3x "
        "wall with caps vs 30x measured without them)."
    ),
    "q09_user_sessions": (
        "shuffle is the event rows themselves keyed by user (lag needs "
        "a per-user sort once); slope ~1 against parquet bytes just "
        "reflects shuffle rows compressing worse than "
        "dictionary-encoded parquet."
    ),
}

_COPURCHASE_NOTE = (
    "two-phase query: the edge-derivation basket self-join dominates the "
    "shuffle and tracks lineitem (this slope, ~= 1), while the graph-phase "
    "shuffle is bounded by the recurring co-purchase edge set — measured "
    "~1.04x edges across this sf pair (support >= 2 distinct orders keeps "
    "the graph nearly constant in this generator), so the graph rounds "
    "contribute almost nothing to the growth; the per-m graph-phase "
    "scaling is receipted by the disjoint-copy ladders instead "
    "(SCALING_100x / SCALING_ITER_100x)."
)
for _q in (
    "q161_copurchase_triangles",
    "q180_clustering_coefficient",
    "q186_kcore_members",
    "q188_copurchase_communities",
    # q189 scores q188's communities on the same graph (the modularity
    # aggregates are edge/community-bounded); q196 pairs within those
    # communities (pair volume bounded by the near-constant edge set's
    # community sizes) — both dominated by the same basket derivation
    "q189_community_modularity",
    "q196_community_name_neardup",
):
    NOTES[_q] = _COPURCHASE_NOTE


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lo_name = os.environ.get("SHUFFLE_LO", "SHUFFLE_sf0.01.json")
    hi_name = os.environ.get("SHUFFLE_HI", "SHUFFLE.json")
    with open(os.path.join(root, lo_name)) as f:
        lo = json.load(f)
    with open(os.path.join(root, hi_name)) as f:
        hi = json.load(f)

    sql_by_name = {s.name: s.sql for s in q.specs()}
    derived = derived_ratios(lo["sf_dir"], hi["sf_dir"])

    out: dict[str, dict] = {}
    for name, h in hi["queries"].items():
        l = lo["queries"].get(name)
        if l is None:
            continue
        hb, lb = h["shuffle_write_bytes"], l["shuffle_write_bytes"]
        hi_in, lo_in = h["input_bytes"], l["input_bytes"]
        tabs = tables_of(name, sql_by_name)
        data_ratio = round(
            dir_bytes(hi["sf_dir"], tabs) / dir_bytes(lo["sf_dir"], tabs), 3
        )
        shuffle_ratio = round(hb / lb, 3) if lb else None
        denom = derived.get(name, {}).get("derived_ratio", data_ratio)
        out[name] = {
            "tables": tabs,
            "shuffle_bytes_lo": lb,
            "shuffle_bytes_hi": hb,
            "shuffle_ratio": shuffle_ratio,
            "data_ratio": data_ratio,
            **derived.get(name, {}),
            "slope": round(shuffle_ratio / denom, 3) if shuffle_ratio else None,
            "input_ratio_rest": round(hi_in / lo_in, 3) if lo_in else None,
            "small_at_both_sf": hb < SMALL_BYTES and lb < SMALL_BYTES,
        }
        if name in NOTES:
            out[name]["note"] = NOTES[name]

    result = {
        "lo_sf_dir": lo["sf_dir"],
        "hi_sf_dir": hi["sf_dir"],
        "queries": out,
    }
    with open(os.path.join(root, "SHUFFLE_SLOPE.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
