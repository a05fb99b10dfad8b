"""Z-order (Morton) interleave key — multi-column data-CLUSTERING for
layout, so parquet min/max stats prune files on EVERY interleaved column,
not just the first sort column.

The 100 TB problem: ``ORDER BY a`` at write time gives perfect file
pruning on ``a`` and none on ``b`` — each file spans b's full range.
Interleaving the bits of both columns into one sort key makes files cover
small HYPER-RECTANGLES of (a, b) space instead of thin slices of a, so a
predicate on either column (or both) skips most files via footer stats —
the same layout trick table formats expose as ``OPTIMIZE ZORDER BY``,
here as a plain column expression + range-partitioned parquet write
(``io.write_zordered``).

Implementation notes:

- Each column is first scaled to a 16-bit grid over its own min/max
  (one tiny aggregate, broadcast-crossed in — no shuffle of the data);
  rank-based scaling would need a global sort, and min/max scaling is
  what layout needs (files cluster by VALUE locality).
- The interleave itself is one higher-order ``aggregate(sequence(..))``
  fold over bit positions — pure JVM expressions inside codegen, built
  as a constant-size tree regardless of bit width.
- The key is for LAYOUT ONLY: it never changes query results, so there
  is no oracle query — the evidence is the bounding-box test
  (tests/test_sources.py): z-ordered files cover a fraction of the
  (a, b) area that linear order or unsorted writes cover.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bits per interleaved column; :func:`zorder_key` narrows this
#: automatically so n columns always fit a signed bigint (16 bits for up
#: to 3 columns, 15 for 4).
ZBITS = 16


def scale_to_grid(col: Column, cmin: Column, cmax: Column, bits: int = ZBITS) -> Column:
    """Value → integer cell in [0, 2^bits) over [cmin, cmax] (doubles).
    Degenerate ranges (min == max) map to cell 0.  NULL values also land
    in cell 0 (``greatest(NULL, 0)`` is 0 — Spark's greatest/least skip
    NULLs), clustering NULL rows with the column's minimum: acceptable
    for layout (they still cluster), documented so nobody expects them at
    the range-partition edge."""
    top = F.lit((1 << bits) - 1)
    span = cmax - cmin
    frac = F.when(span > 0, (col.cast("double") - cmin) / span).otherwise(F.lit(0.0))
    return F.least(F.greatest(F.floor(frac * (top + 1)), F.lit(0)), top).cast("bigint")


def z_interleave(cells: list[Column], bits: int = ZBITS) -> Column:
    """Morton interleave of pre-scaled integer cells (each in
    [0, 2^bits)): bit i of column j lands at position i*len(cells)+j.
    One fold over ``sequence(0, bits-1)`` per column — constant-size
    expression tree, whole-stage-codegen friendly."""
    n = len(cells)
    if not 1 <= n <= 4:
        raise ValueError(f"z_interleave takes 1-4 columns, got {n}")
    if bits * n > 63:
        raise ValueError(f"{n} columns x {bits} bits exceeds a signed bigint")
    # acc | (((c >> i) & 1) << (i*n + j)) folded over bit positions —
    # disjoint target bits, so + is exactly |.  Closure factory: a lambda
    # with default-arg captures would trip the HOF arity check.
    def fold(c: Column, j: int):
        return lambda acc, i: acc + F.call_function(
            "shiftleft",
            F.call_function("shiftright", c, i.cast("int")).bitwiseAND(F.lit(1)),
            (i * n + j).cast("int"),
        )

    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cells):
        key = key + F.aggregate(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            F.lit(0).cast("bigint"),
            fold(c, j),
        )
    return key


def zorder_key(df: DataFrame, cols: list[str], bits: int | None = None) -> Column:
    """The ready-made z-key for ``cols`` of ``df``: scales each column to
    the grid using its own min/max (computed here — one scalar row) and
    interleaves.  The min/max lookup is a driver-side scalar fetch, model
    state like a histogram's bounds — never per-row data.

    ``bits=None`` (default) picks the widest grid that fits a signed
    bigint — ``min(ZBITS, 63 // n)`` — so the advertised 4-column case
    works out of the box (15 bits/column) instead of tripping the
    interleave's overflow check.  An empty or all-NULL column has no
    bounds; every row then lands in cell 0 for that column (degenerate
    but well-defined — an empty frame writes an empty file)."""
    if bits is None:
        bits = min(ZBITS, 63 // max(1, len(cols)))
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__max_{c}") for c in cols],
    ).first()

    def _b(v) -> float:  # None bounds (empty / all-NULL column) → cell 0
        return float(v) if v is not None else 0.0

    cells = [
        scale_to_grid(
            F.col(c),
            F.lit(_b(bounds[f"__min_{c}"])),
            F.lit(_b(bounds[f"__max_{c}"])),
            bits,
        )
        for c in cols
    ]
    return z_interleave(cells, bits)
