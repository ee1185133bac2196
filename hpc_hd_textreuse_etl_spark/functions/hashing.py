"""Cross-engine ("portable") hash primitives.

The fast hash everywhere else in this engine is ``xxhash64`` — JVM-side,
vectorized, the right default at 100 TB. But xxhash64 exists only in
Spark, so operators built on it can only get rows-only verification from
the DuckDB oracle gate. This module provides a second, *portable* hash
family computable bit-identically in Spark SQL and DuckDB SQL:

    H(s) = int(md5_hex(s)[:15], 16)            # 60 bits, non-negative

- Spark : ``CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)``
- DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``

(verified byte-identical; both engines implement RFC-1321 md5 over UTF-8
bytes and the 15-hex-digit prefix fits a signed 64-bit integer with room
for arithmetic).

On top of H, a universal family for MinHash:

    h_i(s) = (a_i * (H(s) mod p) + b_i) mod p,   p = 2^31 - 1 (prime)

with (a_i, b_i) drawn by a seeded driver-side generator. The mod-p keeps
every product below 2^62 (no overflow under Spark 4 ANSI mode) and makes
the family non-monotone in H — a bare linear transform without wrapping
would make every member pick the same argmin shingle and degenerate the
signature (see operators/dedup.py).

Used by the ``hash_family="portable"`` variants of MinHash / SimHash /
hyperplane-LSH so the full pipelines (shingle -> signature -> banding ->
verify) run under the driver's DuckDB value-hash gate, not just a row
count. The xxhash64 defaults remain for production scale.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1; modulus of the universal MinHash family.
MERSENNE_P = 2_147_483_647


def portable_hash64(col: Column) -> Column:
    """60-bit non-negative hash of a string column, identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sparksql(expr: str) -> str:
    """Spark-SQL text form (for use inside higher-order ``F.expr`` folds)."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def portable_hash64_duckdb(expr: str) -> str:
    """DuckDB SQL computing the identical value."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_coeffs(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """``k`` seeded (a, b) pairs for the universal family, a in [1, p-1],
    b in [0, p-1]. Driver-side; inlined as literals into both plans."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P))
        for _ in range(k)
    ]


def hyperplane_coeffs(
    num_tables: int, num_planes: int, dim: int, seed: int = 42
) -> list[list[list[float]]]:
    """Seeded hyperplane coefficients in [-1, 1], shape
    ``[table][plane][dim]``. Computed once on the driver and inlined as
    literal arrays — cheaper than re-hashing (d, p, seed) per row per
    element, and trivially portable to the DuckDB oracle."""
    rng = random.Random(seed)
    return [
        [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
        for _ in range(num_tables)
    ]
