"""Bloom-filter semi-join pruning: filter the FACT side of a join before
its shuffle, using a bit-set summary of the dim keys.

The 100 TB problem this solves: a fact⋈dim equi-join shuffles the entire
fact table on the key even when only a sliver of fact rows have a dim
match.  When the dim key set is small, ``F.broadcast`` + join already
avoids the fact shuffle; but once the dim side has millions of distinct
keys, broadcasting the exact key set stops being free — while a Bloom
filter of those keys stays a few hundred KB at any dim cardinality.
Spark's own runtime filters (``spark.sql.optimizer.runtime.bloomFilter``)
apply the same idea opportunistically; this operator makes it explicit,
deterministic, and portable (the internal ``bloom_filter_agg`` expression
is not registered for SQL/Python use).

Shape:

- **Build** (:func:`build_bloom`): one distributed aggregation over the
  dim keys — each key sets ``num_hashes`` bits; bits are grouped into
  64-bit words and OR-combined (``bit_or`` — associative, map-side
  combinable, at most ``num_bits/64`` groups).  The collected word array
  is MODEL STATE (bounded by ``num_bits``, independent of dim
  cardinality), the same driver-role contract as k-means centroids.
- **Probe** (:func:`might_contain` / :func:`bloom_prune`): a row-local
  expression over the word array inlined as ONE literal — no join, no
  shuffle, evaluated inside the fact scan, so predicate pushdown and
  whole-stage codegen stay intact.

Guarantees: NO false negatives (every key inserted at build time probes
true — pinned by property test), one-sided false positives at the
standard ``(1 - e^(-kn/m))^k`` rate.  A pruned-then-joined plan is
therefore ROW-IDENTICAL to the plain join: the bloom only removes fact
rows the join would drop anyway, and the join removes the bloom's false
positives — which is what makes the pattern oracle-checkable (q106's
oracle is the PLAIN join).

Hashing reuses the engine's portable md5/affine family
(``functions.hashing``) — the same construction as the count-min sketch
(a Bloom filter IS a count-min with OR in place of +), so the bit
positions are deterministic and SQL-replayable if an oracle ever needs
them.  NULL keys hash to NULL and are never inserted nor probed true,
matching equi-join NULL semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_hadoop_automation_in_cloud_spark.functions.hashing import (
    md5_int60,
    minhash_coeffs,
    perm_hash,
)

#: default geometry: 2^20 bits (128 KB of words) x 4 hashes — fpp ~1e-4
#: at 30k keys, ~1% at 300k, degrading gracefully (never incorrectly).
BLOOM_BITS = 1 << 20
BLOOM_HASHES = 4
_BLOOM_SEED = 23


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of the key's bit positions — build and probe must share this
    (same coefficients/modulus) or membership silently fails."""
    coeffs = minhash_coeffs(num_hashes, seed=_BLOOM_SEED)
    h = md5_int60(key.cast("string"))
    return F.array(*[(perm_hash(h, a, b) % num_bits).cast("long") for a, b in coeffs])


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
    distinct pass needed.
    """
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    pos = F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("__pos")
    words = (
        dim.select(pos)
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
    """Row-local membership test against the inlined word array.

    The words ship as ONE array literal inside the plan (128 KB at the
    default geometry) — no join, no broadcast variable, evaluated inside
    whatever scan the caller filters, so it composes with pushdown.
    NULL keys yield NULL (filtered by WHERE), matching equi-join
    semantics.
    """
    if len(words) * 64 != num_bits:
        raise ValueError(
            f"word array has {len(words)} words = {len(words) * 64} bits, "
            f"caller says num_bits={num_bits} — build/probe geometry mismatch"
        )
    w = F.lit([int(x) for x in words])
    checks = []
    coeffs = minhash_coeffs(num_hashes, seed=_BLOOM_SEED)
    h = md5_int60(key.cast("string"))
    for a, b in coeffs:
        pos = perm_hash(h, a, b) % num_bits
        word = F.element_at(w, (pos / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


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
    """
    words = build_bloom(dim, dim_key, num_bits, num_hashes)
    return fact.where(might_contain(F.col(fact_key), words, num_bits, num_hashes))
