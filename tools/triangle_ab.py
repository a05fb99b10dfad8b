"""A/B the degree-ordered triangle enumeration (operators/components.py
triangle_count) against the naive middle-pivot wedge join on a
hub-skewed graph, writing TRIANGLES.json at the repo root.

The claim under test (q161's docstring): naive wedge counting pivots on
every node, so a single hub of degree d contributes d² wedge candidates
— the quadratic cliff real co-occurrence graphs hit on their celebrity
node; degree orientation caps every node's OUT-degree at O(√m), so the
hub's wedges are charged to its low-degree neighbors and total wedge
volume is O(m^1.5).

Graph: one hub (node 0) adjacent to every other node, plus a ring with
2 forward chords per node (deterministic, no RNG) — every ring edge
closes two hub triangles, so both methods must return identical
nonzero counts.  Doubling N doubles m but QUADRUPLES the naive hub
wedges; the oriented wedge count stays ~m (the hub, being
highest-degree, has out-degree ~0 — its wedges vanish).

Measured shape: the wedge count is the claim's direct witness (it
grows with the SQUARE of the hub degree while edges double); wall
crosses over once the naive wedge volume outruns the oriented form's
fixed three-join overhead — the third rung.  Run with
``SPARK_GRAFT_DRIVER_MEM=16g python tools/triangle_ab.py``
(env ``SPARK_GRAFT_TRI_N`` for the base rung, default 4000; rungs are
1x/4x/8x of it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.operators.components import triangle_count
from spark_hadoop_automation_in_cloud_spark.session import get_test_session


def hub_ring_edges(spark, n: int):
    """Hub 0 — every node, plus ring chords i→i+1, i→i+2 (mod n-1 over
    nodes 1..n-1).  Distinct, u<v normalized downstream."""
    spokes = spark.range(1, n).select(
        F.lit(0).cast("bigint").alias("u"), F.col("id").alias("v")
    )
    ring = (
        spark.range(1, n)
        .select(F.col("id").alias("u"), F.explode(F.array(F.lit(1), F.lit(2))).alias("__d"))
        .select("u", (F.lit(1) + (F.col("u") - 1 + F.col("__d")) % (n - 1)).alias("v"))
    )
    return spokes.unionByName(ring)


def naive_triangles(edges):
    """Textbook middle-pivot enumeration on the UNDIRECTED adjacency:
    wedges a—b—c (a<c) pivoting on EVERY node b, closed by edge (a, c).
    Total triangles (each found once via its middle... every triangle
    has 3 middles, so /3 at the end).  Wedge volume = Σ deg(b)² — the
    hub-quadratic form the orientation removes."""
    e = (
        edges.where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    adj = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w1 = adj.select(F.col("u").alias("a"), F.col("v").alias("b"))
    w2 = adj.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = w1.join(w2, "b").where(F.col("a") < F.col("c"))
    tri = wedges.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("c")), ["a", "c"]
    )
    return tri.count() // 3, wedges.count()


def oriented_triangles(edges):
    total = triangle_count(edges, "u", "v", topk=1_000_000_000).agg(
        F.sum("tri_count").alias("s")
    ).first()["s"]
    return int(total) // 3  # each triangle counted once per member node


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def main() -> None:
    n0 = int(os.environ.get("SPARK_GRAFT_TRI_N", "4000"))
    spark = get_test_session("triangle-ab")
    out: dict[str, dict] = {}
    for n in (n0, 4 * n0, 8 * n0):
        edges = hub_ring_edges(spark, n).persist()
        m = edges.count()
        (naive_cnt, naive_wedges), naive_s = timed(lambda: naive_triangles(edges))
        oriented_cnt, oriented_s = timed(lambda: oriented_triangles(edges))
        assert naive_cnt == oriented_cnt, (naive_cnt, oriented_cnt)
        out[f"n={n}"] = {
            "nodes": n,
            "edges": m,
            "triangles": naive_cnt,
            "naive_wedges": naive_wedges,
            "naive_sec": naive_s,
            "oriented_sec": oriented_s,
            "speedup": round(naive_s / oriented_s, 2),
        }
        edges.unpersist()
    rungs = list(out.values())
    result = {
        "note": (
            "hub-skewed graph: k-ing the nodes k-s the edges but k^2-s "
            "the naive hub wedge volume (the quadratic witness); the "
            "oriented form's wedges track m (hub out-degree ~0 under "
            "(degree, node) order), so its wall stays flat while the "
            "naive wall crosses over once wedge volume outruns the "
            "oriented form's fixed three-join overhead"
        ),
        "naive_wedge_growth": round(
            rungs[-1]["naive_wedges"] / rungs[0]["naive_wedges"], 2
        ),
        "edge_growth": round(rungs[-1]["edges"] / rungs[0]["edges"], 2),
        "rungs": out,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "TRIANGLES.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
