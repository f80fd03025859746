"""Partitioned Bloom-filter seen-set sidecar (F5/U2, the north_rule's
"partitioned Bloom/cuckoo-filter URL-seen set keyed by canonicalized URL
hash").

Semantics contract (SURVEY §4 "Exactness vs Bloom"): the reference's
seen set is an exact ``HashSet`` (WebCrawler.java:50), so the Bloom
filter is a *prefilter only* — candidates whose ``might_contain`` is
false are definitely unseen and bypass the exact anti-join entirely;
the rest (true members + false positives) are confirmed by the exact
LEFT ANTI join. FPR therefore affects cost, never results.

Why it matters at 10^10: the J2 anti-join shuffles the full candidate
set against the full seen set every round. With a seen set of 10^10 URLs
and candidate batches of 10^8, ~99% of candidates are new — the Bloom
sidecar routes them around the shuffle, so the exact join only touches
the ~1% that might match.

Build is distributed (partitioned): per URL, k bit positions via
double hashing of ``xxhash64(url)``; explode → ``groupBy(word_index)``
``bit_or`` — one shuffle of (int, long) pairs; the dense bitset is
assembled from the sparse set words (≤ m/64 rows) and broadcast.
Membership test is a vectorized Arrow UDF over the same ``xxhash64``
longs — numpy gather + bit test, no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _positions(hv: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """k bit positions per hash via double hashing — the ONE shared
    implementation used by both build and probe (shape: k × n)."""
    h1 = hv
    h2 = (hv >> np.uint64(32)) | (hv << np.uint64(32))
    return np.stack([(h1 + np.uint64(i) * h2) % np.uint64(m_bits) for i in range(k)])


class BloomSidecar:
    """A broadcast Bloom bitset over ``xxhash64`` values."""

    def __init__(self, spark, words: np.ndarray, n_words: int, k: int):
        self.n_words = n_words
        self.k = k
        self._bcast = spark.sparkContext.broadcast(words)

    def might_contain(self, hash_col: Column) -> Column:
        """Vectorized membership test on an ``xxhash64``-valued column."""
        bcast, k = self._bcast, self.k
        m_bits = self.n_words * 64

        @F.pandas_udf(T.BooleanType())
        def _mc(h: pd.Series) -> pd.Series:
            words = bcast.value
            hv = h.to_numpy(dtype=np.int64).view(np.uint64)
            out = np.ones(len(hv), dtype=bool)
            for pos in _positions(hv, k, m_bits):
                w = (pos >> np.uint64(6)).astype(np.int64)
                b = pos & np.uint64(63)
                out &= (words[w] >> b) & np.uint64(1) != 0
            return pd.Series(out)

        return _mc(hash_col)

    def destroy(self):
        self._bcast.unpersist()


def _params(expected_items: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    n_words = (m + 63) // 64
    k = max(1, round((n_words * 64 / max(1, expected_items)) * math.log(2)))
    return n_words, min(k, 8)


def build_bloom(
    df: DataFrame,
    col: str = "url",
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> BloomSidecar:
    """Distributed Bloom build over ``xxhash64(col)`` (one shuffle of
    (word_index, bits) pairs, map-side combined)."""
    spark = df.sparkSession
    if expected_items is None:
        expected_items = df.count()
    n_words, k = _params(expected_items, fpp)
    m_bits = n_words * 64

    def to_words(batches):
        # per PARTITION: accumulate one dense local bitset across all
        # Arrow batches (vectorized bitwise_or.at), emit its nonzero words
        # once at the end — far fewer shuffled rows than per-batch sparse
        # emission, and no Python-lambda reducers anywhere.
        local = np.zeros(n_words, dtype=np.uint64)
        for pdf in batches:
            hv = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            pos = _positions(hv, k, m_bits).ravel()
            w = (pos >> np.uint64(6)).astype(np.int64)
            bits = np.uint64(1) << (pos & np.uint64(63))
            np.bitwise_or.at(local, w, bits)
        nz = np.nonzero(local)[0]
        yield pd.DataFrame({"w": nz, "bit": local[nz].view(np.int64)})

    sparse = (
        df.select(F.xxhash64(F.col(col)).alias("h"))
        .mapInPandas(to_words, schema="w long, bit long")
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = np.zeros(n_words, dtype=np.int64)
    for r in sparse:
        words[r["w"]] = r["bits"]
    return BloomSidecar(spark, words.view(np.uint64), n_words, k)


def anti_join_with_bloom(
    candidates: DataFrame, seen: DataFrame, on: str, sidecar: BloomSidecar,
    cache_registry: list | None = None,
) -> DataFrame:
    """J2 with the F5 prefilter: definite-new rows bypass the exact join;
    possible members are confirmed by LEFT ANTI. Result set is EXACTLY
    the plain anti-join's (tested).

    ``tagged`` feeds both branches of the union — persist it so the
    candidate pipeline (and the membership UDF) runs once, not twice. The
    persisted frame is appended to ``cache_registry`` (if given) so the
    caller can unpersist after its action; leaked caches across rounds
    evict each other and wreck throughput.
    """
    h = F.xxhash64(F.col(on))
    tagged = candidates.withColumn("_maybe", sidecar.might_contain(h)).persist()
    if cache_registry is not None:
        cache_registry.append(tagged)
    fresh = tagged.filter(~F.col("_maybe")).drop("_maybe")
    confirmed = tagged.filter(F.col("_maybe")).drop("_maybe").join(seen, on, "left_anti")
    return fresh.unionByName(confirmed)
