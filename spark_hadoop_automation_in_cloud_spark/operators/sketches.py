"""Mergeable cardinality sketches: HyperLogLog rollups that re-aggregate
WITHOUT rescanning history.

The 100 TB pattern: a daily job cannot afford ``count_distinct(user_id)``
over all time — that is a full-history shuffle every day.  Instead each
partition (day, zone, …) persists a fixed-size HLL sketch (Apache
DataSketches via Spark's ``hll_sketch_agg``); any later rollup — weekly,
monthly, all-time, per-region — is ``hll_union_agg`` over the stored
sketches, touching one small binary row per partition instead of the raw
facts.  Union-then-estimate is EXACTLY the same state as
sketch-of-the-union (the sketch is a deterministic function of the value
set), so re-aggregation is lossless with respect to the sketch's own
accuracy — pinned by tests/test_operators.py.

Estimates are approximate (~1-2% at lgk=12 — the DataSketches HLL error
bound 1.04/sqrt(2^lgk)); exact distinct stays available where the data is
small enough to shuffle (q45's grouped count_distinct).  This module is
the scale path for cardinality, the same baseline/scale-path split as
q24 vs q25/q30 for similarity search.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: DataSketches HLL lg(k): 2^12 registers ≈ 1.6% relative standard error.
DEFAULT_LGK = 12


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "hll",
) -> DataFrame:
    """One HLL sketch per group — the per-partition state a datamart
    persists (one map-side-combined aggregation; sketch size is fixed at
    ~2^lgk bytes regardless of group volume)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col)
    )


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain and estimate:
    touches one row per INPUT GROUP, never the raw facts."""
    merged = sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias("__merged")
    )
    return merged.select(
        *group_cols,
        F.hll_sketch_estimate("__merged").cast("bigint").alias(out_col),
    )


def estimate(sketch: Column) -> Column:
    """Point estimate from a stored sketch column."""
    return F.hll_sketch_estimate(sketch).cast("bigint")
