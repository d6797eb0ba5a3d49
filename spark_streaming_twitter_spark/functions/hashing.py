"""Portable deterministic hashing: identical values in Spark and DuckDB.

The oracle harness hash-compares values across engines, so any query whose
OUTPUT contains hash values (fingerprints, MinHash signatures, SimHash bits,
LSH bucket keys) needs a hash function both engines compute bit-identically.
Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different algorithms,
so we derive a 60-bit integer from the md5 hex digest — md5 is identical
everywhere:

    Spark :  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB:  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)

15 hex chars = 60 bits → always a positive BIGINT, no overflow in either
engine. For the k independent hash functions MinHash needs, we prepend a
seed token to the input (``md5(seed || ':' || s)``) — the standard
"implicit permutation family" trick.

Scale note: md5 is a JVM built-in evaluated inside whole-stage codegen —
no Python crossing. It is ~2x slower than xxhash64; swap to xxhash64 for
production jobs where cross-engine oracle parity is not needed (the
signatures of these helpers take any Column expression, so call sites
don't change).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash(col: Column) -> Column:
    """60-bit positive BIGINT hash of a string column (md5-derived)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def portable_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def seeded_hash(col: Column, seed: int) -> Column:
    """The ``seed``-th member of a family of independent portable hashes."""
    return portable_hash(F.concat(F.lit(f"{seed}:"), col))


def seeded_hash_sql(expr: str, seed: int) -> str:
    """DuckDB twin of :func:`seeded_hash`."""
    return portable_hash_sql(f"'{seed}:' || {expr}")
