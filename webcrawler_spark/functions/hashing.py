"""Portable hashing expressions.

Two families:

* ``portable_hash64`` — md5-derived 60-bit hash expressed in pure Catalyst,
  chosen because the *identical* value is computable in DuckDB
  (``('0x' || substring(md5(x),1,15))::ubigint``), which makes every
  hash-based operator (exact dedup J5, minhash, simhash) oracle-checkable
  by the driver. 15 hex chars = 60 bits, always non-negative in a signed
  int64.

* ``xxhash64``/``hash`` Spark built-ins — used on the hot path inside the
  crawl engine where oracle portability doesn't matter (seen-set keys,
  salting); they're cheaper than md5.

Reference parity: the reference dedups by exact string equality against
every stored page (DatabaseHandler.java:154-169, an O(N) scan per page);
hashing first then confirming equality preserves those semantics at scale
(SURVEY.md §4 "Content-dedup via DB exact match").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit portable hash: SQL fragment reusable inside expr() strings
PORTABLE_HASH64_SQL = "cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"

# DuckDB equivalent fragment (for oracle_sql authors)
PORTABLE_HASH64_DUCKDB = "(('0x' || substring(md5({col}), 1, 15))::ubigint)::bigint"


def portable_hash64(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def salted_key(col: Column | str, buckets: int) -> Column:
    """Cheap non-portable salt bucket for skew handling on hot keys."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(buckets))
