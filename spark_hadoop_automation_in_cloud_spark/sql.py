"""SQL-string surface: register the lake's tables as temp views so users
can drive the engine with ``spark.sql(...)`` instead of (or alongside) the
DataFrame API.

The reference exposes no SQL interface at all (SURVEY §1.1: "No SQL string
interface exists anywhere"); since every operator here is Catalyst-native,
exposing the catalog is free — the same plans serve both surfaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_hadoop_automation_in_cloud_spark.io import TABLES, read_table


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Create (or replace) one temp view per synthetic table.

    Returns the registered view names.  Views are session-scoped and lazy —
    registration costs nothing until a query touches a view, and each query
    still benefits from pushdown/pruning on the underlying parquet.
    """
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        read_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot convenience: register views, run the query."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
