"""Distributed EXACT global ordering primitives: row numbers, ntiles and
cumulative sums over a total order, without ever moving the frame to a
single partition.

``Window.orderBy(...)`` with no partitionBy — the natural Spark spelling of
"rank everything" — executes as ONE task holding the whole frame.  That is
acceptable for month- or day-cardinality aggregates, but a Pareto cumsum
over every part or an RFM ntile over every customer would serialize a
billion-row frame through a single executor at lake scale.

The classic two-pass shape instead:

1. ``repartitionByRange`` on the order columns — each partition holds a
   contiguous key range, cluster-wide sorted across partitions — then
   ``localCheckpoint`` to PIN that partitioning: the range partitioner
   samples its boundaries per job, so without materialization the stats
   pass and the compute pass could see different cuts (task retries and
   fetch interleaving make upstream row order nondeterministic) and the
   offsets would be applied to a partitioning they weren't measured on;
2. per-partition local ``row_number``/cumsum (an ordinary partitioned
   window — parallel);
3. one tiny driver pass collects the per-partition counts/sums (one row
   per PARTITION, not per data row) and broadcasts prefix offsets back —
   accumulated in exact ``Decimal`` arithmetic, so fractional decimal
   values are never truncated;
4. global value = local value + offset of all preceding partitions.

Determinism contract: the order columns MUST form a total order (include a
unique tiebreaker).  With ties spanning a range boundary the local row
numbers would depend on which side of the cut a row landed; with a total
order the result is independent of partitioning, so these helpers are
output-identical to the single-partition window forms (pinned by
tests/test_operators.py equivalence tests, which also sweep partition
counts).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"


def _default_partitions(df: DataFrame) -> int:
    """Partition count when the caller didn't pass one: executor-core
    parallelism where a SparkContext exists; under Spark Connect (no
    SparkContext on the client) fall back to the session's shuffle
    parallelism conf instead of crashing."""
    spark = df.sparkSession
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 — Connect: PySparkNotImplementedError
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))


def _range_tagged(
    df: DataFrame, order_cols: list[Column], num_partitions: int | None
) -> DataFrame:
    n = num_partitions or _default_partitions(df)
    return (
        df.repartitionByRange(n, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        # eager materialization pins ONE partitioning for both passes
        .localCheckpoint()
    )


def _offset_map(pairs: list[tuple[int, object]], cast_to: str | None) -> Column:
    """pid → prefix-sum-of-preceding-partitions as a literal map.

    Accumulates in exact ``Decimal`` (collected values may be int, Decimal,
    or None for an all-NULL partition) and emits each offset as a string
    literal cast to ``cast_to`` — no float, no silent truncation.
    """
    offs: list[Column] = []
    acc = Decimal(0)
    for pid, v in sorted(pairs, key=lambda p: p[0]):
        lit = F.lit(str(acc)).cast(cast_to) if cast_to else F.lit(int(acc))
        offs += [F.lit(pid), lit]
        acc += Decimal(v) if v is not None else Decimal(0)
    return F.create_map(*offs)


def _tagged_counts(
    df: DataFrame, order_cols: list[Column], num_partitions: int | None
) -> tuple[DataFrame, list[tuple[int, int]]]:
    """Shared first pass of every global-rank primitive: range-tag the
    frame and collect one (pid, row_count) pair per partition — the counts
    are both the rank offsets and (summed) the total row count."""
    tagged = _range_tagged(df, order_cols, num_partitions)
    counts = [
        (r[_PID], r["c"])
        for r in tagged.groupBy(_PID).agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    return tagged, counts


def _global_rank_col(counts: list[tuple[int, int]], order_cols: list[Column]) -> Column:
    """Exact 1-based global rank from a tagged frame's counts: local
    row_number + the broadcast prefix offset of the row's partition."""
    local = F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols))
    return (local + _offset_map(counts, None)[F.col(_PID)]).cast("bigint")


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number by ``order_cols`` (which must include
    a unique tiebreaker), computed with range partitioning + local windows +
    broadcast prefix offsets — never a single-partition sort."""
    tagged, counts = _tagged_counts(df, order_cols, num_partitions)
    if not counts:  # empty frame: create_map() of zero pairs can't resolve
        return tagged.withColumn(out_col, F.lit(None).cast("bigint")).drop(_PID)
    return tagged.withColumn(out_col, _global_rank_col(counts, order_cols)).drop(_PID)


def ntile_from_rank(rank: Column, total: int, k: int) -> Column:
    """Spark ``ntile(k)`` bucket from an exact global 1-based rank: the
    first ``total % k`` buckets take ``total // k + 1`` rows, the rest
    ``total // k`` — the same remainder-to-the-front sizing ntile uses.
    Pure integer expression: composes with :func:`global_row_number` into a
    distributed exact ntile."""
    q, m = divmod(total, k)
    big = q + 1
    threshold = m * big
    small = max(q, 1)  # q == 0 → every rank lands in the first branch
    return (
        F.when(rank <= threshold, F.ceil(rank / F.lit(big)))
        .otherwise(F.lit(m) + F.ceil((rank - F.lit(threshold)) / F.lit(small)))
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact distributed ``ntile(k)`` over the global ``order_cols`` order
    (unique tiebreaker required): one range partitioning whose per-partition
    counts serve BOTH as the rank offsets and (summed) as the total row
    count, so no separate ``count()`` action or second materialization is
    needed — one pass per ordering, vs two for
    ``global_row_number`` + a caller-side count."""
    tagged, counts = _tagged_counts(df, order_cols, num_partitions)
    if not counts:
        return tagged.withColumn(out_col, F.lit(None).cast("int")).drop(_PID)
    total = sum(c for _, c in counts)
    rank = _global_rank_col(counts, order_cols)
    return tagged.withColumn(out_col, ntile_from_rank(rank, total, k)).drop(_PID)


def global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    val_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running total of ``val_col`` over the global ``order_cols``
    order (unique tiebreaker required), two-pass distributed.  Use an
    order-independent value type (integer/decimal) — the per-partition
    offsets are accumulated on the driver in exact Decimal arithmetic and
    cast back to the aggregate's own SQL type, so fractional decimals
    survive; a float ``val_col`` would make the total depend on partition
    count and is the caller's misuse."""
    tagged = _range_tagged(df, order_cols, num_partitions)
    agg = tagged.groupBy(_PID).agg(F.sum(val_col).alias("s"))
    sum_type = agg.schema["s"].dataType.simpleString()
    sums = [(r[_PID], r["s"]) for r in agg.collect()]
    if not sums:  # empty frame
        return tagged.withColumn(out_col, F.lit(None).cast(sum_type)).drop(_PID)
    local = F.sum(val_col).over(
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return tagged.withColumn(
        out_col, local + _offset_map(sums, sum_type)[F.col(_PID)]
    ).drop(_PID)


def group_percentile(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    out_col: str = "pct",
) -> DataFrame:
    """Per-group rank percentile in [0, 1]: ``(rank − 1) / (n − 1)`` over
    the group's total order (unique tiebreaker required) — the score-
    calibration transform that makes quality scores comparable ACROSS
    heterogeneous sources before a global cut (a raw threshold keeps
    whatever source happens to score high; the percentile keeps the same
    FRACTION of every source).

    A single-row group has no spread: its percentile is defined as 0.5
    (the median), mirrored exactly by the SQL twin.

    Scale shape: one hash partition on the group key feeding an ordinary
    partitioned window (rank + count in the same window pass) — groups
    parallelize across the cluster; nothing global, nothing single-
    partition.  This is deliberately NOT the global-order machinery
    above: the order is per group, so the plain partitioned window is
    already the right plan.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    wall = Window.partitionBy(group_col)
    rank = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wall)
    pct = F.when(n > 1, (rank - 1).cast("double") / (n - 1)).otherwise(0.5)
    return df.withColumn(out_col, F.round(pct, 6))


def sql_group_percentile(
    src_sql: str,
    group_col: str,
    order_sql: str,
    cols_sql: str,
    out_col: str = "pct",
) -> str:
    """DuckDB twin of :func:`group_percentile`.  ``src_sql`` yields the
    input; ``order_sql`` is the ORDER BY list (must total-order within a
    group); ``cols_sql`` the output projection of the source columns."""
    return f"""
WITH src AS ({src_sql}),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY {order_sql}) AS __rank,
         COUNT(*) OVER (PARTITION BY {group_col}) AS __n
  FROM src
)
SELECT {cols_sql},
       round(CASE WHEN __n > 1
                  THEN CAST(__rank - 1 AS DOUBLE) / (__n - 1)
                  ELSE 0.5 END, 6) AS {out_col}
FROM r
"""
