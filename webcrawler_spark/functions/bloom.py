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

Two sidecar layouts:

* ``BloomSidecar`` (``build_bloom``) — ONE dense bitset broadcast to
  every executor. Fine to ~10^8 seen URLs; at 10^10 / 1% FPR the bitset
  is m = n·ln(1/p)/ln²2 ≈ 9.59·10^10 bits ≈ **12 GB per executor** —
  unshippable as a broadcast.

* ``ShardedBloomSidecar`` (``build_sharded_bloom``) — the north_rule's
  *partitioned* layout. K per-shard bitsets keyed by
  ``pmod(murmur3(url), K)`` — deliberately the EXACT formula of Spark's
  ``HashPartitioning`` partition id (``Pmod(Murmur3Hash(url), K)``), so
  any stage already hash-partitioned on the url column (the admission
  pipeline's first-occurrence aggregate output is) sees exactly one
  shard per task when K = shuffle partitions. Shards are ``.npy`` files
  on shared storage (object store in production), loaded lazily per
  Python worker through a small LRU — no broadcast anywhere.
  Memory math at 10^10 URLs / 1% FPR / K = 4096: 12 GB total → 2.9 MB
  per shard; resident per executor ≤ LRU_cap (8) × 2.9 MB ≈ 23 MB,
  vs 12 GB for the dense broadcast. Build is one shuffle of
  (shard, hash) pairs; each shard file is written by exactly one task
  (same-shard rows co-locate under the shard-keyed repartition) via
  tmp-file + atomic rename, so task retries never publish a torn file.
  A ``_META`` marker written last certifies a completed build
  (``load_sharded_bloom`` reopens carried state across drivers), and
  ``update_sharded_bloom`` maintains the sidecar INCREMENTALLY: the
  per-round seen delta is OR-ed into a copy-on-write successor version
  — only delta-touched shards rewritten, the rest hard-linked — so
  per-round maintenance costs O(delta), not a full 10^10-row rebuild.

Membership tests in both layouts are vectorized Arrow UDFs over
``xxhash64`` longs — numpy gather + bit test, no per-row Python.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile
from collections import OrderedDict

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


def _or_bits(words: np.ndarray, hv: np.ndarray, k: int, m_bits: int) -> None:
    """Set the k bits of every hash into the bitset, in place — the ONE
    build-side implementation (dense build, sharded build, incremental
    update), paired with ``_test_bits`` so set-then-test can never skew."""
    pos = _positions(hv, k, m_bits).ravel()
    w = (pos >> np.uint64(6)).astype(np.int64)
    bits = np.uint64(1) << (pos & np.uint64(63))
    np.bitwise_or.at(words, w, bits)


def _test_bits(words: np.ndarray, hv: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """Membership test for every hash against the bitset (the ONE
    probe-side implementation; no false negatives vs ``_or_bits`` by
    construction — property-tested in tests/test_sidecar_properties.py)."""
    out = np.ones(len(hv), dtype=bool)
    for pos in _positions(hv, k, m_bits):
        w = (pos >> np.uint64(6)).astype(np.int64)
        b = pos & np.uint64(63)
        out &= (words[w] >> b) & np.uint64(1) != 0
    return out


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
            return pd.Series(_test_bits(words, hv, k, m_bits))

        return _mc(hash_col)

    def probe(self, url_col: Column) -> Column:
        """Membership test on the raw key column (shared sidecar API)."""
        return self.might_contain(F.xxhash64(url_col))

    def destroy(self):
        self._bcast.unpersist()


# ---------------------------------------------------------------------------
# Sharded sidecar (the 10^10-scale layout — see module docstring)
# ---------------------------------------------------------------------------

# per-Python-worker shard cache: workers are reused across tasks, so a task
# probing shard s usually finds it already resident from the previous task
# on the same worker. Keyed by (path, shard) — a rebuilt sidecar lives at a
# fresh path, so stale entries simply age out.
_SHARD_CACHE: OrderedDict[tuple[str, int], np.ndarray] = OrderedDict()
_SHARD_CACHE_MAX = 8


def _shard_file(path: str, shard: int) -> str:
    return os.path.join(path, f"shard_{shard:06d}.npy")


def _load_shard(path: str, shard: int, n_words: int) -> np.ndarray:
    key = (path, shard)
    arr = _SHARD_CACHE.get(key)
    if arr is not None:
        _SHARD_CACHE.move_to_end(key)
        return arr
    f = _shard_file(path, shard)
    if os.path.exists(f):
        arr = np.load(f).view(np.uint64)
    else:
        # no seen URL hashed into this shard — empty bitset
        arr = np.zeros(n_words, dtype=np.uint64)
    _SHARD_CACHE[key] = arr
    while len(_SHARD_CACHE) > _SHARD_CACHE_MAX:
        _SHARD_CACHE.popitem(last=False)
    return arr


def shard_of(col: Column, n_shards: int) -> Column:
    """Shard id of a key — ``pmod(murmur3(col), K)``, the exact partition-id
    expression of Spark's ``HashPartitioning`` so shard locality aligns
    with existing url-keyed exchanges."""
    return F.pmod(F.hash(col), F.lit(n_shards))


class ShardedBloomSidecar:
    """K per-shard Bloom bitsets on shared storage, probed lazily."""

    def __init__(self, path: str, n_shards: int, n_words: int, k: int,
                 n_items: int | None = None, capacity: int | None = None):
        self.path = path
        self.n_shards = n_shards
        self.n_words = n_words  # words per shard
        self.k = k
        # fill accounting for the incremental-update path: n_items is the
        # (approximate) count of keys inserted so far, capacity the count
        # the layout was SIZED for. Past capacity the FPR degrades beyond
        # the build-time fpp — a cost signal only (the exact confirm join
        # guarantees results regardless) — and ``overfull`` tells the
        # maintainer to do a fresh full build with more headroom.
        self.n_items = n_items
        self.capacity = capacity

    @property
    def overfull(self) -> bool:
        return (self.n_items is not None and self.capacity is not None
                and self.n_items > self.capacity)

    def might_contain(self, hash_col: Column, shard_col: Column) -> Column:
        """Vectorized membership test on (xxhash64 value, shard id)."""
        path, n_shards, n_words, k = self.path, self.n_shards, self.n_words, self.k
        m_bits = n_words * 64

        @F.pandas_udf(T.BooleanType())
        def _mc(h: pd.Series, s: pd.Series) -> pd.Series:
            hv = h.to_numpy(dtype=np.int64).view(np.uint64)
            sv = s.to_numpy(dtype=np.int64)
            out = np.zeros(len(hv), dtype=bool)
            for shard in np.unique(sv):
                words = _load_shard(path, int(shard), n_words)
                mask = sv == shard
                out[mask] = _test_bits(words, hv[mask], k, m_bits)
            return pd.Series(out)

        return _mc(hash_col, shard_col)

    def probe(self, url_col: Column) -> Column:
        return self.might_contain(
            F.xxhash64(url_col), shard_of(url_col, self.n_shards)
        )

    def destroy(self):
        shutil.rmtree(self.path, ignore_errors=True)


# -- shared version-directory helpers (used by the cuckoo sibling too) --

def write_sidecar_meta(path: str, meta: dict) -> None:
    """Publish a version's ``_META`` marker atomically, LAST — after every
    shard file's rename — so its presence certifies a completed build."""
    import json

    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_META"))


def read_sidecar_meta(path: str) -> dict | None:
    meta_f = os.path.join(path, "_META")
    if not os.path.exists(meta_f):
        return None
    import json

    with open(meta_f) as fh:
        return json.load(fh)


def link_untouched_shards(old_path: str, new_path: str, shard_file,
                          n_shards: int, touched_ids: set[int]) -> None:
    """Copy-on-write plumbing for incremental updates: hard-link every
    shard file the delta did not touch into the successor version
    directory (copy fallback across filesystems)."""
    for s in range(n_shards):
        if s in touched_ids:
            continue
        src = shard_file(old_path, s)
        if os.path.exists(src):
            dst = shard_file(new_path, s)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)


def load_sharded_bloom(path: str) -> ShardedBloomSidecar | None:
    """Open a previously built sidecar from its ``_META`` marker (written
    last, after every shard file's atomic rename — so its presence means
    the build completed). Returns None if no completed build is at
    ``path``. This is how a resumed driver (or the next BSP round) picks
    up the carried seen-set state without rebuilding it."""
    m = read_sidecar_meta(path)
    if m is None or "n_words" not in m:  # absent, or the cuckoo layout
        return None
    return ShardedBloomSidecar(path, m["n_shards"], m["n_words"], m["k"],
                               m.get("n_items"), m.get("capacity"))


def _write_meta(path: str, n_shards: int, n_words: int, k: int,
                n_items: int | None, capacity: int | None) -> None:
    write_sidecar_meta(path, {"n_shards": n_shards, "n_words": n_words,
                              "k": k, "n_items": n_items,
                              "capacity": capacity})


def build_sharded_bloom(
    df: DataFrame,
    col: str = "url",
    path: str | None = None,
    n_shards: int | None = None,
    expected_items: int | None = None,
    fpp: float = 0.01,
    reuse_existing: bool = False,
    headroom: float = 1.0,
    dir: str | None = None,
) -> ShardedBloomSidecar:
    """Distributed partitioned Bloom build: one shuffle of (shard, hash)
    pairs; each task accumulates dense local bitsets for its shards and
    publishes one ``.npy`` per shard (tmp + atomic rename).

    ``reuse_existing=True`` returns the completed sidecar already at
    ``path`` (via its ``_META`` marker) instead of rebuilding.
    ``headroom`` over-sizes the layout (e.g. 2.0 = room to double) so the
    sidecar can then be maintained INCREMENTALLY with
    ``update_sharded_bloom`` instead of rebuilt per round — the
    carried-state shape."""
    spark = df.sparkSession
    if reuse_existing and path is not None:
        existing = load_sharded_bloom(path)
        # layout must match what THIS call would build (a completed build
        # by different sizing code is not the requested filter). Content
        # staleness is the caller's contract — like any cached build
        # artifact, key the path on the inputs' identity.
        if existing is not None and (
            n_shards is None or existing.n_shards == n_shards
        ) and (
            expected_items is None
            or existing.capacity == max(1, int(expected_items * headroom))
        ):
            return existing
    if path is None:
        # ``dir`` roots the version directory (e.g. the snapshot store's
        # sidecar/ area so carried state survives driver restarts)
        path = tempfile.mkdtemp(prefix="bloom_sidecar_", dir=dir)
    os.makedirs(path, exist_ok=True)
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if expected_items is None:
        expected_items = df.count()
    capacity = max(1, int(expected_items * headroom))
    # size each shard for its expected uniform load + 20% skew headroom
    per_shard = max(64, int(capacity / n_shards * 1.2) + 64)
    n_words, k = _params(per_shard, fpp)
    m_bits = n_words * 64

    data = df.select(
        shard_of(F.col(col), n_shards).alias("s"),
        F.xxhash64(F.col(col)).alias("h"),
    ).repartition(n_shards, "s")

    def write_shards(batches):
        local: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            for s, grp in pdf.groupby("s"):
                arr = local.setdefault(int(s), np.zeros(n_words, dtype=np.uint64))
                hv = grp["h"].to_numpy(dtype=np.int64).view(np.uint64)
                _or_bits(arr, hv, k, m_bits)
                counts[int(s)] = counts.get(int(s), 0) + len(hv)
        for s, arr in local.items():
            final = _shard_file(path, s)
            fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
            with os.fdopen(fd, "wb") as fh:
                np.save(fh, arr.view(np.int64))
            os.replace(tmp, final)
        yield pd.DataFrame({"s": list(local), "n": [counts[s] for s in local]})

    # one row per shard — the sum is the actual inserted row count (the
    # fill accounting ``update_sharded_bloom`` advances), free with the
    # action that drives the write
    inserted = int(data.mapInPandas(
        write_shards, schema="s int, n long").toPandas()["n"].sum())
    # marker written LAST: its presence certifies every shard file landed
    _write_meta(path, n_shards, n_words, k, inserted, capacity)
    return ShardedBloomSidecar(path, n_shards, n_words, k,
                               inserted, capacity)


def update_sharded_bloom(
    sidecar: ShardedBloomSidecar, df: DataFrame, col: str = "url",
    dir: str | None = None,
) -> ShardedBloomSidecar:
    """Incremental carried-state maintenance: OR the delta's bits into a
    COPY-ON-WRITE successor of ``sidecar``. Only shards the delta touches
    are rewritten; every untouched shard file is hard-linked into the new
    version directory (copy fallback across filesystems), so the cost is
    O(delta + touched shards), not O(seen) — at 10^10 URLs a per-round
    delta of 10^7 touches each of K=4096 shards with ~2.4k keys and moves
    ~12 GB of shard file I/O in the worst case, vs a full 10^10-row
    rebuild shuffle. The old path stays intact until the caller destroys
    it: worker-side shard LRUs key on (path, shard), so the fresh path
    invalidates them naturally, and in-flight probes of the old version
    stay consistent (same reason the full rebuild used a fresh path).

    Layout (n_shards, n_words, k) is preserved, so the result is
    bit-identical to building old ∪ delta at the same layout (asserted in
    tests/test_bloom_seen.py). Check ``overfull`` afterwards: past the
    build-time capacity the FPR degrades (cost, never results — the
    exact confirm join guarantees that) and the maintainer should do a
    fresh full build with more headroom."""
    old_path = sidecar.path
    n_shards, n_words, k = sidecar.n_shards, sidecar.n_words, sidecar.k
    m_bits = n_words * 64
    new_path = tempfile.mkdtemp(prefix="bloom_sidecar_", dir=dir)

    data = df.select(
        shard_of(F.col(col), n_shards).alias("s"),
        F.xxhash64(F.col(col)).alias("h"),
    ).repartition(n_shards, "s")

    def or_into(batches):
        local: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            for s, grp in pdf.groupby("s"):
                arr = local.get(int(s))
                if arr is None:
                    f = _shard_file(old_path, int(s))
                    arr = (np.load(f).view(np.uint64).copy()
                           if os.path.exists(f)
                           else np.zeros(n_words, dtype=np.uint64))
                    local[int(s)] = arr
                hv = grp["h"].to_numpy(dtype=np.int64).view(np.uint64)
                _or_bits(arr, hv, k, m_bits)
                counts[int(s)] = counts.get(int(s), 0) + len(hv)
        for s, arr in local.items():
            fd, tmp = tempfile.mkstemp(dir=new_path, suffix=".tmp")
            with os.fdopen(fd, "wb") as fh:
                np.save(fh, arr.view(np.int64))
            os.replace(tmp, _shard_file(new_path, s))
        yield pd.DataFrame({"s": list(local), "n": [counts[s] for s in local]})

    # one row per touched shard — aggregate-sized collect
    touched = data.mapInPandas(or_into, schema="s int, n long").toPandas()
    touched_ids = set(int(s) for s in touched["s"])
    if not touched_ids:
        # empty delta: the sidecar already represents old ∪ delta — hand
        # the ORIGINAL back rather than churning a new version (callers
        # must therefore only destroy the old version when the update
        # returned a different one)
        shutil.rmtree(new_path, ignore_errors=True)
        return sidecar
    link_untouched_shards(old_path, new_path, _shard_file,
                          n_shards, touched_ids)
    n_items = (None if sidecar.n_items is None
               else sidecar.n_items + int(touched["n"].sum()))
    _write_meta(new_path, n_shards, n_words, k, n_items, sidecar.capacity)
    return ShardedBloomSidecar(new_path, n_shards, n_words, k,
                               n_items, sidecar.capacity)


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
            _or_bits(local, hv, k, m_bits)
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
    candidates: DataFrame, seen: DataFrame, on: str,
    sidecar: BloomSidecar | ShardedBloomSidecar,
    cache_registry: list | None = None,
) -> DataFrame:
    """J2 with the F5 prefilter: definite-new rows bypass the exact join;
    possible members are confirmed by LEFT ANTI. Result set is EXACTLY
    the plain anti-join's (tested). Works with either sidecar layout.

    ``tagged`` feeds both branches of the union — persist it so the
    candidate pipeline (and the membership UDF) runs once, not twice. The
    persisted frame is appended to ``cache_registry`` (if given) so the
    caller can unpersist after its action; leaked caches across rounds
    evict each other and wreck throughput.
    """
    tagged = candidates.withColumn("_maybe", sidecar.probe(F.col(on))).persist()
    if cache_registry is not None:
        cache_registry.append(tagged)
    fresh = tagged.filter(~F.col("_maybe")).drop("_maybe")
    confirmed = tagged.filter(F.col("_maybe")).drop("_maybe").join(seen, on, "left_anti")
    return fresh.unionByName(confirmed)
