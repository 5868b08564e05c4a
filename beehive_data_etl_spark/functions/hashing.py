"""Portable hashing primitives for dedup / fingerprinting operators.

Cross-engine requirement: the driver verifies every query against a
DuckDB oracle, so hash functions must produce IDENTICAL integers in
Spark SQL and DuckDB SQL. ``xxhash64``/``hash`` differ between engines;
md5 does not — so the portable 32-bit hash is the first 8 hex chars of
md5, decoded to a BIGINT:

- Spark:  ``conv(substring(md5(s), 1, 8), 16, 10)::long``
- DuckDB: ``('0x' || substr(md5(s), 1, 8))::BIGINT``

Inside the engine's hot paths (bucketing, salting) we keep the
JVM-native ``xxhash64`` — portability only matters where an oracle
recomputes the value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash32(col: Column | str, salt: str = "") -> Column:
    """md5-derived 32-bit unsigned hash as LongType; equals the DuckDB
    expression ``('0x' || substr(md5(s || salt), 1, 8))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(c, F.lit(salt))
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str, salt: str = "") -> str:
    """The exactly-matching DuckDB SQL fragment."""
    inner = f"{expr} || '{salt}'" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, 8))::BIGINT)"


_MERSENNE31 = (1 << 31) - 1


def _permutation_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash permutations,
    derived from splitmix-style mixing of the index — identical
    literals land in the SQL oracle."""
    params = []
    for i in range(k):
        x = (i + 1) * 0x9E3779B97F4A7C15 % (1 << 64)
        x ^= x >> 30
        a = (x % (_MERSENNE31 - 1)) + 1  # a in [1, p-1]
        b = (x >> 33) % _MERSENNE31
        params.append((a, b))
    return params


def minhash_signature(shingles: Column, k: int) -> Column:
    """k-permutation MinHash over an array<string> of shingles.

    One md5-derived base hash per shingle, then k cheap universal-hash
    permutations ``(a_i*h + b_i) mod (2^31-1)`` — the classic
    implementation (Broder '97): k x fewer digest evaluations than
    hashing ``shingle||salt_i`` per component, and every intermediate
    stays < 2^62 so a DuckDB oracle evaluates the identical arithmetic.
    Pure expression: JVM-side per row, no shuffle, no UDF."""
    base = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )

    def _component(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(base, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE31))
        )

    return F.array(*[_component(a, b) for a, b in _permutation_params(k)])


def minhash_signature_sql(shingles_expr: str, k: int) -> str:
    base = (
        f"list_transform({shingles_expr}, "
        "s -> ('0x' || substr(md5(s), 1, 8))::BIGINT)"
    )
    comps = ", ".join(
        f"list_aggregate(list_transform({base}, "
        f"h -> (h * {a} + {b}) % {_MERSENNE31}), 'min')"
        for a, b in _permutation_params(k)
    )
    return f"[{comps}]"
