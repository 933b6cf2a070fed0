"""Deterministic, engine-portable hashing.

Everything seeded in this repo hashes through md5 so that (a) results are
identical across Python, Spark SQL, and DuckDB, and (b) nothing depends on
process state, wall clock, or PYTHONHASHSEED. 60-bit values (15 hex chars)
fit a signed int64 in every engine.

Portable SQL forms (used by the minhash/LSH oracle queries):
  Spark :  cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)
  DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT
"""

from __future__ import annotations

import hashlib


def h60(s: str) -> int:
    """60-bit deterministic hash of a string (non-negative int)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def spark_h60_sql(expr: str) -> str:
    """Spark SQL expression computing h60(expr)."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def duckdb_h60_sql(expr: str) -> str:
    """DuckDB SQL expression computing h60(expr)."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
