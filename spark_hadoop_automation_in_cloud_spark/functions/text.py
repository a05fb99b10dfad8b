"""Text-analysis column expressions for document pipelines.

Whitespace/token/character metrics, quality scores, language-marker counts —
all built-in string expressions (JVM-side).  Each helper has a DuckDB-SQL
template so the oracle can verify the identical computation.

Design note for 100 TB: these are embarrassingly parallel per-row
projections; the only scale concern is scan width, so callers should select
only (id, text)-shaped projections before applying them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_count(text: Column) -> Column:
    """Whitespace-delimited token count (0 for empty/blank strings)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


SQL_TOKEN_COUNT = (
    "CASE WHEN length(trim({t})) = 0 THEN 0"
    " ELSE len(string_split_regex(trim({t}), '\\s+')) END"
)


def occurrence_count(text: Column, needle: str) -> Column:
    """Number of (non-overlapping) occurrences of a literal substring."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def sql_occurrence_count(expr: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return (
        f"CAST((length({expr}) - length(replace({expr}, '{esc}', ''))) / {len(needle)} AS INT)"
    )


def char_class_ratio(text: Column, pattern: str) -> Column:
    """Fraction of characters NOT matching ``pattern`` removed — i.e. the
    ratio of characters that match the regex character class."""
    kept = F.length(F.regexp_replace(text, pattern, ""))
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        (F.length(text) - kept).cast("double") / F.length(text)
    )


def sql_char_class_ratio(expr: str, pattern: str) -> str:
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0.0 ELSE "
        f"CAST(length({expr}) - length(regexp_replace({expr}, '{pattern}', '', 'g')) AS DOUBLE)"
        f" / length({expr}) END"
    )
