"""Timestamp-encoding-safe time expressions.

The lake's event timestamps have shipped in three parquet encodings over the
project's life: TIMESTAMP(NANOS) (read as epoch-nanos long under the legacy
``nanosAsLong`` conf), TIMESTAMP(MICROS) without UTC adjustment (read as
``TIMESTAMP_NTZ``), and plain ``TIMESTAMP``.  Spark's ``unix_micros`` accepts
only ``TIMESTAMP``, so every epoch-math site goes through :func:`epoch_us`,
which is total over all timestamp flavors the reader can produce.

The engine pins ``spark.sql.session.timeZone=UTC`` (session.py), under which
the NTZ→TIMESTAMP cast is value-preserving — the same wall-clock instant the
DuckDB oracle's naive ``epoch_us`` sees.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Integer epoch-microseconds of a timestamp column, regardless of
    whether the reader delivered ``TIMESTAMP`` or ``TIMESTAMP_NTZ``.

    ``cast("timestamp")`` is a no-op on ``TIMESTAMP`` and a session-timezone
    reinterpretation on ``TIMESTAMP_NTZ`` — value-preserving under the UTC
    session default.  Exact integer math: no double rounding at any scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def ntz_to_utc_timestamp(col_name: str) -> Column:
    """``TIMESTAMP_NTZ`` column → ``TIMESTAMP``, treating the naive value as
    UTC **regardless of the session timezone**.

    A plain ``cast("timestamp")`` reinterprets the naive value in the
    SESSION timezone — correct under this engine's pinned UTC default, but a
    vanilla session on a non-UTC host would silently shift every instant.
    ``timestampdiff(MICROSECOND, NTZ-epoch, col)`` is pure NTZ arithmetic
    (no timezone anywhere), and ``timestamp_micros`` builds the LTZ instant
    from the epoch count — the composition is timezone-independent.

    The input column must actually be NTZ (callers branch on the observed
    dtype — see ``io._normalize_ts``).
    """
    return F.timestamp_micros(
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col_name}`)"
        )
    )
