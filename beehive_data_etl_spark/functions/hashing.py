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


def minhash_signature(shingles: Column, k: int) -> Column:
    """k-permutation MinHash over an array<string> of shingles: the i-th
    component is min over shingles of H(shingle || '#i'). Pure
    expression — evaluated JVM-side per row, no shuffle, no UDF."""
    def _component(salt: str) -> Column:
        # closure (NOT a default arg: a 2-param lambda would be called
        # by transform() with (element, index) and swallow the salt)
        return F.array_min(
            F.transform(
                shingles,
                lambda s: F.conv(
                    F.substring(F.md5(F.concat(s, F.lit(salt))), 1, 8), 16, 10
                ).cast("long"),
            )
        )

    return F.array(*[_component(f"#{i}") for i in range(k)])


def minhash_signature_sql(shingles_expr: str, k: int) -> str:
    comps = ", ".join(
        f"list_aggregate(list_transform({shingles_expr}, "
        f"s -> ('0x' || substr(md5(s || '#{i}'), 1, 8))::BIGINT), 'min')"
        for i in range(k)
    )
    return f"[{comps}]"
