"""Portable content hashing.

Spark's native ``F.hash``/``F.xxhash64`` (Murmur3/xxHash) have no DuckDB
equivalent, so cross-engine-checkable operators use an md5-derived 60-bit
integer hash instead: both engines md5 the same bytes and read the first 15
hex chars as an integer.  15 hex digits = 60 bits < 63, so it always fits a
signed BIGINT in both engines.

This is the foundation for exact dedup, MinHash, SimHash and document
fingerprinting (SURVEY §7.3 step 9 extensions).  At 100 TB scale md5 is
still computed distributed, per-row, JVM-side (no Python boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large primes for the MinHash permutation family h_i(x) = (a_i*x + b_i) % P.
MERSENNE_P = (1 << 61) - 1


def md5_int60(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def sql_md5_int60(expr: str) -> str:
    """DuckDB equivalent of :func:`md5_int60`."""
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


def minhash_coeffs(num_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutation family.

    Pure integer recurrence (no RNG library) so the oracle SQL can inline the
    same literal constants.
    """
    coeffs = []
    a, b = seed, seed * 31 + 7
    for _ in range(num_perm):
        a = (a * 1_103_515_245 + 12_345) % MERSENNE_P
        b = (b * 69_069 + 1) % MERSENNE_P
        coeffs.append((a | 1, b))  # odd multiplier → bijective-ish
    return coeffs


def perm_hash(x: Column, a: int, b: int) -> Column:
    """h(x) = (a*x + b) % P on 60-bit inputs.

    a,b < 2^61 and x < 2^60 would overflow 64-bit multiply, so reduce the
    multiplier into 31 bits first — both engines then compute
    (a % 2^31) * x + b without overflow (< 2^91?  no: (2^31)(2^60) = 2^91).
    To stay in signed-64 range we instead fold x to 32 bits and use a 31-bit
    multiplier: (a_32 * x_32 + b_32) % P32.  Collision rate 2^-32-ish per
    permutation is fine for MinHash banding.
    """
    a32 = (a % 0x7FFFFFFF) | 1
    b32 = b % 0x7FFFFFFF
    x32 = x % F.lit(0xFFFFFFFF)
    return (x32 * F.lit(a32) + F.lit(b32)) % F.lit(0x7FFFFFFF)


def sql_perm_hash(expr: str, a: int, b: int) -> str:
    a32 = (a % 0x7FFFFFFF) | 1
    b32 = b % 0x7FFFFFFF
    return f"((({expr}) % 4294967295) * {a32} + {b32}) % 2147483647"


def md5_prefix_int(col: Column, nhex: int, salt: str | None = None) -> Column:
    """First ``nhex`` hex chars of md5(str(col) [|| salt]) as a BIGINT.

    The ONE definition of the repo's deterministic-bucket idiom (hash
    splits, stratified buckets, shard keys): nhex <= 15 keeps the value
    inside a signed 64-bit integer, and the optional salt decorrelates
    independent uses of the same id column.  The SQL twin below must stay
    byte-equivalent — every Spark caller has a DuckDB oracle replaying
    the identical arithmetic.
    """
    if not 1 <= nhex <= 15:
        raise ValueError(f"nhex must be in [1, 15], got {nhex}")
    s = col.cast("string") if salt is None else F.concat(col.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(s), 1, nhex), 16, 10).cast("bigint")


def sql_md5_prefix_int(expr: str, nhex: int, salt: str | None = None) -> str:
    """DuckDB equivalent of :func:`md5_prefix_int`.

    The salt lands inside a single-quoted SQL literal, so embedded quotes
    are doubled (standard SQL escaping) — the Column-API twin needs no
    escaping, and an unescaped quote here would silently diverge the two
    engines (or break the oracle outright).  Backslashes are literal in
    DuckDB's default string syntax, so no further escaping applies.
    """
    if not 1 <= nhex <= 15:
        raise ValueError(f"nhex must be in [1, 15], got {nhex}")
    if salt is None:
        s = f"CAST({expr} AS VARCHAR)"
    else:
        s = f"CAST({expr} AS VARCHAR) || '{salt.replace(chr(39), chr(39) * 2)}'"
    return f"CAST(('0x' || substr(md5({s}), 1, {nhex})) AS BIGINT)"
