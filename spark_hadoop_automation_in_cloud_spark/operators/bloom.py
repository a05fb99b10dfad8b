"""Bloom-filter semi-join pruning: filter the FACT side of a join before
its shuffle, using a bit-set summary of the dim keys.

The 100 TB problem this solves: a fact⋈dim equi-join shuffles the entire
fact table on the key even when only a sliver of fact rows have a dim
match.  When the dim key set is small, ``F.broadcast`` + join already
avoids the fact shuffle; but once the dim side has millions of distinct
keys, broadcasting the exact key set stops being free — while a Bloom
filter of those keys stays a few hundred KB at any dim cardinality.
Spark's own runtime filters (``spark.sql.optimizer.runtime.bloomFilter``)
apply the same idea opportunistically; this operator makes it explicit
and deterministic (the internal ``bloom_filter_agg`` expression is not
registered for SQL/Python use).

Shape:

- **Build** (:func:`build_bloom`): one distributed aggregation over the
  dim keys — each key sets ``num_hashes`` bits; bits are grouped into
  64-bit words and OR-combined (``bit_or`` — associative, map-side
  combinable, at most ``num_bits/64`` groups).  The collected word array
  is MODEL STATE (bounded by ``num_bits``, independent of dim
  cardinality), the same driver-role contract as k-means centroids.
- **Probe** (:func:`might_contain` / :func:`bloom_prune`): a row-local
  expression over the word array — no join, no shuffle, evaluated inside
  the fact scan, so predicate pushdown and whole-stage codegen stay
  intact.  The words travel as ONE JSON string literal unwrapped by a
  foldable ``from_json`` — Catalyst constant-folds it to a single array
  literal at optimization time.  (The naive ``F.lit(list)`` expands to
  one py4j literal call PER ELEMENT — measured 7s of driver time at
  2^20 bits — and the resulting 16k-node CreateArray knocked the filter
  out of efficient codegen, ~3.5µs/row; the folded form costs ~0.15s to
  build and probes at hash speed.)

Hashing is ``xxhash64(key, seed_i)`` — JVM-native, deterministic across
runs/retries/partitionings (what reproducibility actually requires).
Nothing here needs the portable md5/affine family the sketches use for
DuckDB replay, because the bloom's oracle story is STRONGER than hash
replay: prune+join is row-identical to the plain join whatever the hash
does (q106's oracle is the plain join), as long as there are no false
negatives — which the property test pins.  xxhash64 ignores NULL inputs
(it hashes the remaining arguments) rather than returning NULL, so both
sides guard NULL keys explicitly: never inserted at build, probe yields
NULL (filtered by WHERE) — exactly equi-join NULL semantics.

Guarantees: NO false negatives; one-sided false positives at the
standard ``(1 - e^(-kn/m))^k`` rate — the join after the prune removes
them, so results are exact.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default geometry: 2^20 bits (128 KB of words) x 4 hashes — fpp ~1e-4
#: at 30k keys, ~1% at 300k, degrading gracefully (never incorrectly).
BLOOM_BITS = 1 << 20
BLOOM_HASHES = 4


def _check_geometry(num_bits: int, num_hashes: int) -> None:
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")


def _position(key: Column, i: int, num_bits: int) -> Column:
    """Bit position of hash ``i`` for a key — build and probe must share
    this (same seed scheme and modulus) or membership silently fails."""
    return F.pmod(F.xxhash64(key.cast("string"), F.lit(i)), F.lit(num_bits))


def build_bloom(
    dim: DataFrame,
    key_col: str,
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> list[int]:
    """Bloom words for the dim key set: ``num_bits/64`` signed-64 words.

    One exploded projection + one ``bit_or`` aggregation (map-side
    combined, ≤ ``num_bits/64`` groups); only the bounded word table is
    collected.  Duplicate dim keys are free (OR is idempotent) — no
    distinct pass needed.  NULL keys are skipped (an equi-join would
    never match them).
    """
    _check_geometry(num_bits, num_hashes)
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_position(key, i, num_bits) for i in range(num_hashes)])
    ).alias("__pos")
    words = (
        dim.where(key.isNotNull())
        .select(pos)
        .select(
            (F.col("__pos") / 64).cast("int").alias("__w"),
            # call_function: the PySpark shiftleft wrapper only takes a
            # Python-int shift; the SQL function itself accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
        .collect()
    )
    out = [0] * (num_bits // 64)
    for r in words:
        out[int(r["__w"])] = int(r["__bits"])
    return out


def might_contain(
    key: Column,
    words: list[int],
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> Column:
    """Row-local membership test against the word array.

    The words ship as one JSON string literal + foldable ``from_json``
    (see module docstring) — no join, no broadcast variable, evaluated
    inside whatever scan the caller filters, so it composes with
    pushdown.  NULL keys yield NULL (filtered by WHERE), matching
    equi-join semantics — guarded explicitly because xxhash64 would
    otherwise hash the seed alone and could probe true.
    """
    _check_geometry(num_bits, num_hashes)
    if len(words) * 64 != num_bits:
        raise ValueError(
            f"word array has {len(words)} words = {len(words) * 64} bits, "
            f"caller says num_bits={num_bits} — build/probe geometry mismatch"
        )
    warr = F.from_json(F.lit(json.dumps([int(x) for x in words])), "array<bigint>")
    out = None
    for i in range(num_hashes):
        pos = _position(key, i, num_bits)
        word = F.element_at(warr, (pos / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        c = word.bitwiseAND(mask) != 0
        out = c if out is None else (out & c)
    return F.when(key.isNull(), F.lit(None).cast("boolean")).otherwise(out)


def bloom_prune(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Fact rows whose key MIGHT match a dim key — a superset of the
    join's fact input, a (usually small) subset of the fact table.

    Follow with the exact join: ``bloom_prune(f, k, d, k').join(d, ...)``
    is row-identical to ``f.join(d, ...)`` (no false negatives; the join
    removes false positives), but the shuffle — if the join still needs
    one — carries only the pruned rows.

    The two key columns must share a data type: the hash canonicalizes
    via CAST-to-string, and an equi-join that matches under implicit
    numeric widening (DOUBLE 1.0 vs BIGINT 1) would hash DIFFERENT
    strings ("1.0" vs "1") — a silent false negative, the one failure
    this operator promises never to produce.  Cast one side explicitly
    before pruning; the check below makes the mismatch loud.
    """
    ft = fact.schema[fact_key].dataType
    dt = dim.schema[dim_key].dataType
    if ft != dt:
        raise ValueError(
            f"bloom_prune key type mismatch: fact.{fact_key} is "
            f"{ft.simpleString()} but dim.{dim_key} is {dt.simpleString()} — "
            "string-canonicalized hashing would produce false negatives "
            "where the equi-join's implicit cast still matches; cast one "
            "side first"
        )
    words = build_bloom(dim, dim_key, num_bits, num_hashes)
    return fact.where(might_contain(F.col(fact_key), words, num_bits, num_hashes))
