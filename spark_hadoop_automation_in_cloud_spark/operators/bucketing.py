"""Hive-style bucketed tables: the co-located big-big join.

Broadcast covers the small-dim side of the engine's join story; at 100 TB
the OTHER recurring shape is two FACT-sized tables joined repeatedly on
the same key (documents × embeddings, events × user state, train pairs ×
scores).  Shuffling both sides on every join is the single largest
avoidable cost in that pipeline — the classic fix is to fix the
partitioning ONCE in the table layout: ``bucketBy(n, key)``
hash-routes rows into a fixed bucket count persisted with the table,
and every later equi-join (or aggregation) on that key consumes the
scan's existing ``HashPartitioning`` directly — the plan carries a
SortMergeJoin with NO Exchange on either side (pinned by
``tests/test_sources.py``).  The write itself moves zero shuffle bytes
too: Spark writes per-task bucket FILES rather than exchanging
(BUCKETING.json measures both sides of the trade — at 100× corpus the
plain join moves 58 MB / 700k records per execution, the bucketed join
moves none).

Semantics are untouched: a bucketed join is row-identical to the plain
join (q153's oracle IS the plain join in DuckDB — the value hash proves
the co-located layout dropped/duplicated nothing).

Scale notes:
- bucket count is a LAYOUT constant, chosen once per table for the
  target scale (hundreds-to-thousands at 100 TB so a bucket fits an
  executor's scan budget); both sides of a co-located join must agree on
  it (Spark joins bucketed tables with differing counts by re-shuffling
  the smaller-bucketed side — legal, but forfeits the point).
- ``sortBy(key)`` persists within-bucket order; Spark exploits it (skips
  the SMJ sort) only when each bucket holds exactly one file, so writers
  coalesce per-bucket output (``spark.sql.sources.bucketing
  .maxBucketsPerFile``-style hygiene is the table owner's job).
- bucket metadata lives in the session catalog (in-memory here; a Hive
  metastore in production) — ``spark.read.parquet`` of the same files
  sees plain parquet and re-shuffles, so consumers must read via
  ``spark.table``.

Reference parity: the reference engine has no bucketed storage (its
joins re-shuffle per run — SURVEY §2.3/§6); this module is part of the
§7.3-step-9 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and by
    default sorted) by ``key`` into ``n_buckets`` buckets — the one-time
    shuffle that every later join/aggregation on ``key`` amortizes.

    Overwrites both the catalog entry and the files (idempotent reruns);
    callers own dropping the table when its lifetime ends
    (:func:`drop_table`).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    """Remove the catalog entry (files are the caller's tempdir)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket keys.

    Reads through ``spark.table`` (bucket metadata applies only via the
    catalog) — with matching bucket counts the physical plan is a
    SortMergeJoin fed directly by the two bucketed scans, zero Exchange.

    Same-named keys (the common co-located shape: both tables bucketed
    on ``doc_id``) join on the column-name list — a bare
    ``F.col(k) == F.col(k)`` would be AMBIGUOUS_REFERENCE against the
    joined schema; differently-named keys use dataframe-qualified
    references for the same reason.
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    if left_key == right_key:
        return lt.join(rt, on=[left_key], how=how)
    return lt.join(rt, on=lt[left_key] == rt[right_key], how=how)
