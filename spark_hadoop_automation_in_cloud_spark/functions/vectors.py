"""Vector math over ``array<float>`` embedding columns.

All built-in higher-order functions (``zip_with`` + ``aggregate``) — the
arithmetic runs JVM-side per row with no Python boundary, and the
element-order of the fold matches DuckDB's ``list_*`` functions so a
double-precision fold produces bit-comparable results (both engines fold
left-to-right after casting elements to double).

This is the baseline for similarity search (SURVEY §7.3 step 9); the scale
path (LSH bucketing) is in ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, folded left-to-right in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB-oracle equivalents.  list_cosine_similarity exists in DuckDB 1.0 but
# its internal fold/precision is not contractually identical, so the oracle
# SQL spells out the same fold with list_aggregate-free arithmetic:
SQL_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
SQL_NORM = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
