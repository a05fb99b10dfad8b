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

import json

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


# ---------------------------------------------------------------------------
# Mergeable quantile sketches (log-bucket histograms)
# ---------------------------------------------------------------------------
#
# Same persist-then-reaggregate pattern as the HLL sketches, for the third
# classic sketch question (cardinality → HLL above, frequency → q93's
# count-min, quantiles → here): each partition stores a fixed-resolution
# log-bucket histogram of a value column; any coarser rollup merges the
# stored bucket counts — associative integer addition, so unlike HLL the
# merge is EXACTLY the sketch of the union, bit-for-bit.  A quantile
# estimate reads the cumulative bucket counts and returns the bucket's
# geometric midpoint: relative error bounded by the bucket growth factor
# (value within ×(1+eps) of a true q-quantile element's bucket).

#: default bucket growth: 1% relative resolution, ln(10)/ln(1.01) ≈ 231
#: buckets per decade of dynamic range — a few KB of state per group.
DEFAULT_EPS = 0.01

#: largest finite double — used both to reject non-finite values (NaN/±inf
#: compare false against it) and as the bound the offset is derived from.
_DBL_MAX = 1.7976931348623157e308


def _check_eps(eps: float) -> None:
    # lower bound: below ~1e-9 the offset (~7.5e11) times the dynamic
    # range pushes bucket codes toward bigint overflow, and the state size
    # stops being a "sketch" in any meaningful sense
    if not 1e-9 <= eps < 1.0:
        raise ValueError(f"eps must be in [1e-9, 1), got {eps}")


def _eps_nano(eps: float) -> int:
    """eps as an exact integer format tag stored inside every sketch."""
    return round(eps * 1e9)


def _guarded_buckets(sketch_col: str, eps: float) -> Column:
    """The stored bucket array, AFTER verifying the stored format tag
    matches the caller's eps — bucket codes and offsets from different
    resolutions are incompatible, and without this check mixing them
    would corrupt merges/estimates silently."""
    ok = F.col(f"{sketch_col}.eps_nano") == F.lit(_eps_nano(eps))
    return F.when(ok, F.col(f"{sketch_col}.buckets")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("quantile sketch format mismatch: stored eps_nano="),
                F.col(f"{sketch_col}.eps_nano").cast("string"),
                F.lit(f", caller eps_nano={_eps_nano(eps)} — rebuild, don't mix"),
            )
        )
    )


def _offset(eps: float) -> int:
    """Encoding offset, DERIVED FROM eps: the raw log index
    floor(ln|v|/ln(1+eps)) spans ±ln(DBL_MAX·margin)/ln(1+eps) over all
    finite doubles (subnormals reach ~e^-745), so offset = that span + 2
    keeps every positive-value code > 0 and every negative-value code < 0
    at ANY resolution — a fixed constant sized for one eps would let the
    sign ranges collide again at finer resolutions.

    eps is therefore PART OF THE PERSISTED FORMAT: sketches written with
    one eps cannot be merged with or estimated under another (codes and
    offsets differ) — rebuild, don't mix.
    """
    import math

    return int(math.ceil(746.0 / math.log1p(eps))) + 2


def _bucket(v: Column, eps: float) -> Column:
    """Sign-aware, ORDER-PRESERVING log-scale bucket code (bigint).

    v > 0 → +(floor(ln v / ln(1+eps)) + offset); v < 0 mirrors with the
    magnitude's code negated; v = 0 → 0.  The offset (see ``_offset``)
    keeps the three ranges disjoint — without it, positives in (0, 1) have
    negative raw indices and would collide with the zero and negative
    encodings (sign-flipped estimates).  Codes are bigint: at fine eps the
    offset exceeds int32."""
    import math

    lg = math.log1p(eps)
    code = (F.floor(F.log(F.abs(v)) / F.lit(lg)) + F.lit(_offset(eps))).cast("bigint")
    return (
        F.when(v == 0.0, F.lit(0))
        .when(v > 0.0, code)
        .otherwise(-code)
        .cast("bigint")
    )


def _finite(v: Column) -> Column:
    """Keep only finite values: NULL, NaN and ±inf all fail
    ``abs(v) <= DBL_MAX`` (NaN comparisons are false), so non-finite
    inputs carry no rank — the same skip semantics SQL aggregates apply
    to NULL, extended to the values ln/floor cannot encode."""
    return F.abs(v) <= F.lit(_DBL_MAX)


def _representative(bucket: Column, eps: float) -> Column:
    """Geometric midpoint of a bucket — the estimate returned for any
    quantile that lands in it.  A value in bucket b lies in
    [(1+eps)^b, (1+eps)^(b+1)), so the midpoint is within a factor
    sqrt(1+eps) of every member — the (1+eps) relative bound."""
    raw = F.abs(bucket).cast("double") - F.lit(float(_offset(eps)))
    mid = F.pow(F.lit(1.0 + eps), raw + 0.5)
    return (
        F.when(bucket == 0, F.lit(0.0))
        .when(bucket > 0, mid)
        .otherwise(-mid)
    )


def quantile_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    eps: float = DEFAULT_EPS,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """One mergeable quantile sketch per group:
    ``struct(eps_nano, buckets: sorted array<(bucket, cnt)>)``.  One
    map-side-combined aggregation; state is bounded by the value range's
    bucket count, not group volume.  Non-finite values — NULL, a failed
    numeric cast, NaN, ±inf — are ignored (the HLL-family / SQL-aggregate
    skip semantics): they carry no rank.

    ``eps`` is part of the persisted FORMAT (codes and offsets differ per
    resolution), so it is stored inside the sketch as an integer tag;
    merge/estimate verify it against their own eps and raise on mismatch
    instead of silently combining incompatible codes."""
    _check_eps(eps)
    # try_cast: under ANSI mode a plain cast THROWS on malformed input;
    # here an uncastable value should behave like NULL (skipped), not
    # fail the whole sketch build
    v = F.col(value_col).try_cast("double")
    b = _bucket(v, eps)
    counts = (
        df.where(_finite(v))  # post-cast: uncastable strings are nulls too
        .groupBy(*group_cols, b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("__b").alias("bucket"), F.col("__c").alias("cnt")))
    )
    return counts.groupBy(*group_cols).agg(
        F.struct(
            F.lit(_eps_nano(eps)).cast("bigint").alias("eps_nano"),
            arr.alias("buckets"),
        ).alias(sketch_col)
    )


def merge_quantile_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    eps: float = DEFAULT_EPS,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Re-aggregate stored sketches to a coarser grain: explode the bucket
    arrays, sum counts per bucket, re-collect.  Touches one row per stored
    bucket — never the raw facts — and the result is IDENTICAL to
    sketching the union directly (integer addition; pinned by test).
    Every input sketch's stored eps tag is verified against ``eps``."""
    _check_eps(eps)
    ex = sketches.select(
        *group_cols, F.explode(_guarded_buckets(sketch_col, eps)).alias("__e")
    ).select(*group_cols, F.col("__e.bucket").alias("__b"), F.col("__e.cnt").alias("__c"))
    summed = ex.groupBy(*group_cols, "__b").agg(F.sum("__c").alias("__c"))
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("__b").alias("bucket"), F.col("__c").alias("cnt")))
    )
    return summed.groupBy(*group_cols).agg(
        F.struct(
            F.lit(_eps_nano(eps)).cast("bigint").alias("eps_nano"),
            arr.alias("buckets"),
        ).alias(sketch_col)
    )


def quantile_buckets(
    sketches: DataFrame,
    group_cols: list[str],
    qs: list[float],
    eps: float = DEFAULT_EPS,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Per-group quantile BUCKET CODES from stored sketches — the
    integer half of :func:`quantile_estimates`, exposed because a bucket
    code is exactly comparable against :func:`value_bucket` of raw
    values on ANY engine (pure integer arithmetic), where the
    representative double would reintroduce last-ulp comparison hazards
    (q130's per-source threshold filter is the consumer).

    Output: group_cols..., q (double), bucket (bigint).  Rank rule: the
    smallest bucket whose cumulative count reaches ``ceil(q * total)``
    (q=0 → the first non-empty bucket); the product is snapped to a 1e-9
    grid before the ceil, because a q not exactly representable in binary
    (q=0.07, total=100 → 7.0000000000000009) would otherwise ceil one
    rank too high — any SQL oracle must apply the identical
    ``ceil(round(q * total, 9))``.  Single pass: the quantile list
    explodes from a literal array, so the sketch plan executes ONCE
    however many quantiles are asked for — the per-q cumulative fold is
    an array expression over the (already tiny) stored buckets.
    """
    _check_eps(eps)
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of range: {q}")
    if {"q", "est", "__q", "__total", "__buckets"} & set(group_cols):
        raise ValueError(
            "group_cols may not use the reserved names q/est/__q/__total/__buckets"
        )
    buckets = _guarded_buckets(sketch_col, eps)  # verifies the stored eps tag
    total = F.aggregate(
        buckets, F.lit(0).cast("bigint"), lambda acc, s: acc + s["cnt"]
    )
    # internal __q alias so the fold's reference can't collide with data
    # columns; renamed to the public `q` on output
    out = sketches.select(
        *group_cols, buckets.alias("__buckets"), total.alias("__total")
    ).select(
        *group_cols,
        "__buckets",
        "__total",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("__q"),
    )
    rank = F.greatest(
        F.ceil(F.round(F.col("__q") * F.col("__total"), 9)), F.lit(1)
    ).cast("bigint")
    # running cumulative fold: keep (remaining_rank, found_bucket)
    folded = F.aggregate(
        F.col("__buckets"),
        F.struct(rank.alias("rem"), F.lit(None).cast("bigint").alias("bucket")),
        lambda acc, s: F.when(acc["bucket"].isNotNull(), acc).otherwise(
            F.when(
                s["cnt"] >= acc["rem"],
                F.struct(acc["rem"].alias("rem"), s["bucket"].alias("bucket")),
            ).otherwise(
                F.struct(
                    (acc["rem"] - s["cnt"]).alias("rem"),
                    F.lit(None).cast("bigint").alias("bucket"),
                )
            )
        ),
    )
    return out.select(
        *group_cols,
        F.col("__q").alias("q"),
        folded["bucket"].alias("bucket"),
    )


def quantile_estimates(
    sketches: DataFrame,
    group_cols: list[str],
    qs: list[float],
    eps: float = DEFAULT_EPS,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Per-group quantile estimates from stored sketches: the
    :func:`quantile_buckets` codes mapped to their geometric-midpoint
    representatives.  Output: group_cols..., q (double), est (double)."""
    picked = quantile_buckets(sketches, group_cols, qs, eps, sketch_col)
    return picked.select(
        *group_cols,
        "q",
        # no decimal rounding: the estimate is a deterministic pow() of
        # literals, and absolute 9dp rounding would flatten sub-1e-9
        # magnitudes to zero — destroying the sketch's RELATIVE guarantee
        _representative(F.col("bucket"), eps).alias("est"),
    )


def value_bucket(v: Column, eps: float = DEFAULT_EPS) -> Column:
    """Public bucket coder: the sketch's sign-aware log-scale code for a
    raw value (``_bucket`` with the eps guard) — compare against
    :func:`quantile_buckets` output for integer-exact threshold filters
    (values the sketch cannot encode — NULL/NaN/±inf — code NULL and
    fail any comparison, the same skip semantics the sketch build
    applies)."""
    _check_eps(eps)
    return F.when(_finite(v), _bucket(v, eps)).otherwise(
        F.lit(None).cast("bigint")
    )


def sql_value_bucket(expr: str, eps: float = DEFAULT_EPS) -> str:
    """DuckDB twin of :func:`value_bucket` — the identical double
    constants inlined via float repr (the q102 oracle precedent: ln(1+eps)
    via log1p, not the SQL ln(1.01), so a floor can't flip in the last
    ulp), identical sign/zero/non-finite branches."""
    import math

    _check_eps(eps)
    lg = repr(math.log1p(eps))
    off = _offset(eps)
    code = f"(CAST(floor(ln(abs({expr})) / {lg}) AS BIGINT) + {off})"
    return (
        f"CASE WHEN NOT (abs({expr}) <= {_DBL_MAX!r}) THEN NULL "
        f"WHEN {expr} = 0.0 THEN 0 "
        f"WHEN {expr} > 0.0 THEN {code} "
        f"ELSE -{code} END"
    )


# ---------------------------------------------------------------------------
# Mergeable count-min sketches (frequency)
# ---------------------------------------------------------------------------
#
# q93 demonstrates the estimate; these helpers are the persist/merge shape
# (same contract as the HLL and quantile families): the sketch is stored
# as (row_i, bucket, n) cell rows per group, merged by summing cells —
# exact, associative — and point estimates take the min over rows.

from spark_hadoop_automation_in_cloud_spark.functions.hashing import (
    md5_int60,
    minhash_coeffs,
    perm_hash,
)

#: default geometry: 4 rows x 256 buckets — overestimate bound e*N/w with
#: failure probability exp(-depth) per the standard CM analysis.
CM_DEPTH = 4
CM_WIDTH = 256
_CM_SEED = 11

#: field width of the packed (depth, width, seed) format tag below
_CM_TAG_FIELD = 1 << 21


def _cm_tag(depth: int, width: int, seed: int = _CM_SEED) -> int:
    """The CM geometry as ONE bigint format tag, stored in every sketch
    row (constant column — run-length compresses to nothing in parquet).
    Same role as the quantile sketches' eps_nano: cells built under one
    (depth, width, seed) are meaningless under another, so merge/estimate
    verify the stored tag against their caller's geometry and raise
    instead of silently mixing incompatible hash spaces."""
    for name, v in (("depth", depth), ("width", width), ("seed", seed)):
        if not 1 <= v < _CM_TAG_FIELD:
            raise ValueError(f"cm {name} out of range [1, 2^21): {v}")
    return (depth * _CM_TAG_FIELD + width) * _CM_TAG_FIELD + seed


def _guarded_cm_n(depth: int, width: int, tag_col: str = "cm_tag") -> Column:
    """The stored cell count, AFTER verifying the row's format tag matches
    the caller's geometry (see :func:`_cm_tag`)."""
    expected = _cm_tag(depth, width)
    ok = F.col(tag_col) == F.lit(expected)
    return F.when(ok, F.col("n")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("count-min sketch format mismatch: stored tag="),
                F.col(tag_col).cast("string"),
                F.lit(
                    f", caller (depth={depth}, width={width}, seed={_CM_SEED})"
                    f" tag={expected} — rebuild, don't mix"
                ),
            )
        )
    )


def _cm_buckets(value_col: str | Column, depth: int, width: int) -> Column:
    """The CM hash geometry, in ONE place: the array of per-row bucket
    indices for a value.  Sketch build and estimate must share this (same
    coefficients/fold/modulus) or estimates silently match nothing."""
    coeffs = minhash_coeffs(depth, seed=_CM_SEED)
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    h = md5_int60(col.cast("string"))
    return F.array(*[(perm_hash(h, a, b) % width).cast("int") for a, b in coeffs])


def countmin_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Count-min cell rows per group: (group..., row_i, bucket, n, cm_tag).
    One map-side-combined aggregation; state is depth x width cells per
    group regardless of volume.  Only touched cells are materialized —
    absent cells mean zero (the estimate side restores them).  ``cm_tag``
    packs (depth, width, seed): the geometry is part of the persisted
    FORMAT, verified by merge/estimate (see :func:`_cm_tag`)."""
    ex = df.select(
        *group_cols,
        F.posexplode(_cm_buckets(value_col, depth, width)).alias("row_i", "bucket"),
    )
    return ex.groupBy(*group_cols, "row_i", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("cm_tag", F.lit(_cm_tag(depth, width)).cast("bigint"))


def merge_countmin_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Re-aggregate stored cell rows to a coarser grain: sum per cell —
    exactly the sketch of the union.  Every input row's stored format tag
    is verified against the caller's (depth, width) before its count is
    used; a mismatched geometry raises instead of corrupting the merge."""
    guarded = sketches.select(
        *group_cols, "row_i", "bucket", _guarded_cm_n(depth, width).alias("n")
    )
    return guarded.groupBy(*group_cols, "row_i", "bucket").agg(
        F.sum("n").alias("n")
    ).withColumn("cm_tag", F.lit(_cm_tag(depth, width)).cast("bigint"))


def countmin_estimate(
    sketches: DataFrame,
    group_cols: list[str],
    items: DataFrame,
    value_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Estimated frequency of each item per group: min over the item's
    depth cells.  ``items`` carries group_cols + value_col; the sketch
    side is depth x width rows per group — broadcast-sized.

    LEFT join + zero-fill: a cell the sketch never materialized counts as
    0 (canonical CM), so an item absent from the sketched data estimates
    0 instead of vanishing from the output — or worse, taking its min
    over only the cells that happen to collide with heavy keys.

    Every stored cell's format tag is verified against the caller's
    (depth, width) — the guard sits on the sketch side BEFORE the join,
    so zero-filled (unmatched) cells don't trip it."""
    guarded = sketches.select(
        *group_cols, "row_i", "bucket", _guarded_cm_n(depth, width).alias("n")
    )
    ex = items.select(
        *group_cols,
        value_col,
        F.posexplode(_cm_buckets(value_col, depth, width)).alias("row_i", "bucket"),
    )
    return (
        ex.join(F.broadcast(guarded), [*group_cols, "row_i", "bucket"], "left")
        .groupBy(*group_cols, value_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("bigint").alias("est_n"))
    )


# ---------------------------------------------------------------------------
# Exact heavy hitters via a count-min screen
# ---------------------------------------------------------------------------
#
# The md5-based count-min geometry above exists for PERSISTED sketches,
# where every cell must be replayable in oracle SQL (q105's cell-exact
# chain).  The screen below is transient — built, probed, and discarded
# inside one query, and the operator's RESULT is exact and therefore
# geometry-independent — so it uses JVM-native ``xxhash64`` instead
# (the bloom.py precedent): the md5→conv→perm chain measured ~8s per
# 600k-row probe pass at sf0.1, xxhash64 ~0.3s, with identical screening
# guarantees (overestimate-only).


def _hh_bucket(key: Column, i: int, width: int) -> Column:
    """Depth-row ``i``'s cell index for a key — build and probe must share
    this (same seed scheme and modulus) or the screen silently admits
    everything (or worse, nothing: false negatives).  String-canonicalized
    like ``bloom._position`` — callers comparing across columns must cast
    to a common type first."""
    return F.pmod(F.xxhash64(key.cast("string"), F.lit(i)), F.lit(width))


def _hh_table(df: DataFrame, value_col: str, depth: int, width: int) -> list[list[int]]:
    """Dense ``depth x width`` count-min table over non-NULL values.

    One map-side-combined aggregation to at most ``depth * width`` cells;
    only that bounded table crosses the driver — the same bounded-model-
    state shape as ``bloom.build_bloom`` (never data-sized)."""
    key = F.col(value_col)
    cells = (
        df.select(
            F.posexplode(
                F.array(*[_hh_bucket(key, i, width) for i in range(depth)])
            ).alias("__row", "__bucket")
        )
        .groupBy("__row", "__bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    table = [[0] * width for _ in range(depth)]
    for r in cells:
        table[int(r["__row"])][int(r["__bucket"])] = int(r["__n"])
    return table


def _hh_estimate(key: Column, table: list[list[int]]) -> Column:
    """Row-local count-min estimate against a collected table: min over
    the depth rows of the key's cells.  The table ships as one JSON
    string literal + foldable ``from_json`` (the q106 bloom idiom — the
    naive per-element ``lit`` measured ~7s of driver time there); the
    probe is ``depth`` xxhash64 calls + array lookups, inside whatever
    scan the caller filters, so it composes with pushdown and codegen.
    The geometry comes from the table's own shape — there is no separate
    width argument to get out of sync with it."""
    arr = F.from_json(
        F.lit(json.dumps(table)),
        "array<array<bigint>>",
    )
    cells = [
        F.element_at(
            F.element_at(arr, i + 1),
            (_hh_bucket(key, i, len(table[i])) + 1).cast("int"),
        )
        for i in range(len(table))
    ]
    return cells[0] if len(cells) == 1 else F.least(*cells)


def heavy_hitters_exact(
    df: DataFrame,
    value_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 32768,
) -> DataFrame:
    """All values whose EXACT total frequency is >= ``threshold`` —
    without an unbounded-state aggregation over the full distinct-value
    space.  Output: (value_col, freq), freq exact.

    The naive ``groupBy(value).count().where(count >= T)`` is correct but
    its hash-aggregate state and shuffle key space grow with the number
    of DISTINCT values — at 100 TB of n-grams or join keys that is
    billions of groups, spilling every executor.  This is the classic
    two-pass screen instead:

    1. count-min build: one map-side-combined aggregation to a bounded
       ``depth x width`` cell table, collected to the driver (bounded
       model state, never data-sized).
    2. row-local screen in a second scan: occurrences whose count-min
       estimate clears the threshold survive.  Count-min only
       OVERestimates, so no true heavy hitter is ever dropped — the
       candidate set is a superset of the answer.
    3. exact count over candidates only: aggregation state and shuffle
       are proportional to the (few) heavy candidates, and the exact
       HAVING removes the screen's false positives.

    The result is EXACTLY the naive answer for ANY geometry — width and
    depth only tune the candidate fraction (pinned by the equality
    property test; HEAVY_HITTERS.json measures fraction and wall on real
    data).  Sizing rule: keep ``width >= ~8 * N / threshold`` (N = total
    occurrences), i.e. size for SUPPORT (threshold = phi*N → width ~
    8/phi, constant at any corpus size).  A constant absolute threshold
    while N grows blows the screen — average cell mass N/width exceeds
    the threshold and every key becomes a candidate; the result stays
    exact, the pruning dies (measured: HEAVY_HITTERS.json
    ``blown_geometry`` vs the flat constant-support ladder).  Two uses
    this repo cares about: heavy-key discovery feeding
    the salted joins (operators/skew.py — find the keys worth salting
    without a full key census) and corpus boilerplate/vocabulary mining
    (grams occurring >= T times — the corpus-aggregate sibling of
    dedup.repeated_ngram_doc_stats' per-document signal).

    NULL values are excluded up front: a NULL key has no frequency
    semantics here (GROUP BY would make NULL a group, but every
    downstream use — salting, vocab pruning — keys an equi-join where
    NULL never matches).  Documented loudly because the naive form
    differs.
    """
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    vals = df.where(F.col(value_col).isNotNull())
    table = _hh_table(vals, value_col, depth, width)
    est = _hh_estimate(F.col(value_col), table)
    return (
        vals.where(est >= threshold)
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .where(F.col("freq") >= threshold)
    )


def overlap_estimate(
    left: DataFrame,
    right: DataFrame,
    group_cols: list[str],
    left_key: str,
    right_key: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Distinct-key OVERLAP estimate between two tables per group, by HLL
    inclusion–exclusion — the join-size planning primitive: "how many of
    this segment's keys appear on the other side?" answered from two
    fixed-size sketches, without running (or shuffling) the join.

    ``left`` carries the group columns; ``right`` is sketched globally
    (one sketch) and broadcast.  ``est_overlap = est_left + est_right −
    est_union`` with the union via ``hll_union`` — the standard
    inclusion–exclusion composition, whose error is bounded by the sum
    of the three estimates' bounds (each 1.04/√2^lgk relative).

    Output: group_cols..., est_left, est_right, est_union, est_overlap
    (bigint; inclusion–exclusion can go slightly negative on tiny
    overlaps — reported as-is, floor at the caller).

    Scale shape: two map-side-combined sketch aggregations (state 2^lgk
    bytes per group / per side) + a 1-row broadcast; no key shuffle at
    all — the point, at 100 TB, is sizing the join BEFORE paying for it.
    """
    ska = distinct_sketches(left, group_cols, left_key, lgk, sketch_col="__a")
    skb = right.agg(F.hll_sketch_agg(right_key, F.lit(lgk)).alias("__b"))
    j = ska.crossJoin(F.broadcast(skb))
    ea = F.hll_sketch_estimate("__a").cast("bigint")
    eb = F.hll_sketch_estimate("__b").cast("bigint")
    eu = F.hll_sketch_estimate(F.hll_union("__a", "__b")).cast("bigint")
    return j.select(
        *group_cols,
        ea.alias("est_left"),
        eb.alias("est_right"),
        eu.alias("est_union"),
        (ea + eb - eu).alias("est_overlap"),
    )
