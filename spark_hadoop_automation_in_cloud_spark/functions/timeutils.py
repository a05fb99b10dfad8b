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


def to_timestamp_any(col: Column | str) -> Column:
    """Normalize any timestamp flavor to ``TIMESTAMP`` (UTC session)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")
