"""Partitioned cuckoo-filter seen-set sidecar — the north_rule's other
named layout ("partitioned Bloom/cuckoo-filter URL-seen set"), sibling of
``functions/bloom.py``'s ``ShardedBloomSidecar`` with the same probe
contract (``probe(url_col) -> BooleanType`` Arrow UDF), so
``anti_join_with_bloom`` accepts either.

Why a cuckoo filter at all (Fan, Andersen, Kaminsky, Mitzenmacher,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014 — public):
it supports **deletion**, which a Bloom filter cannot. The crawl engine's
seen set is insert-only per round (the Bloom sidecar stays the default),
but re-crawl policies evict URLs whose TTL expired so they become
fetchable again — with Bloom that forces a full sidecar rebuild; with
cuckoo it is a per-shard fingerprint removal (``delete``; the engine's
eviction path uses ``delete_guarded``, which skips evictions whose code
a surviving key aliases — see its docstring for why that guard is what
keeps set-semantics deletion false-negative-free).

Layout per shard: ``m`` buckets × 4 slots of 16-bit fingerprints
(0 = empty), ``m`` a power of two so the partner bucket
``i2 = i1 XOR h(fp)`` is an involution (lookup/delete find an item from
either bucket). Semantics contract is the same as Bloom's (SURVEY §4):
the filter is a *prefilter*; possible members are confirmed by the exact
anti-join, so FPR (≈ 2·b / 2^f ≈ 0.012% at b=4, f=16) affects cost,
never results. **No false negatives ever**: when a kick chain exhausts
MAX_KICKS, the displaced (bucket, fingerprint) entry goes to a stash
(the standard cuckoo 'victim cache') checked at probe time —
sized-with-headroom shards keep it empty or near-empty.

Memory math at 10^10 URLs, K = 4096 shards: buckets are sized at
n·1.2/4 rounded up to a power of two, so load ∈ [0.42, 0.83] → bytes =
m·4·2 ≈ 10^10·1.2·2/4096 per shard ≈ **5.9 MB/shard** (≤ 2× after pow2
rounding), ~24-48 GB total on shared storage, resident per executor
≤ LRU_cap(8) × shard size ≈ 47-94 MB.
(Bloom at 1% FPR is half the space but admits ~80× more confirm-join
traffic and cannot delete; pick per workload.)

Build is one shuffle of (shard, hash) pairs — identical dataflow to
``build_sharded_bloom``; per shard the bulk insert is vectorized
(rank-based placement into i1 then i2 via argsort/cumcount; only the
residual overflow walks the classic kick loop), and each shard publishes
one ``.npz`` via tmp-file + atomic rename.

Like the Bloom sibling, the sidecar is maintained INCREMENTALLY:
``update_sharded_cuckoo`` inserts only the per-round seen delta into a
copy-on-write successor version (untouched shards hard-link), a
``_META`` marker written last certifies completed builds
(``load_sharded_cuckoo`` reopens carried state across drivers), and fill
accounting (``n_items`` vs the sizing ``capacity``) signals when a fresh
full build with more headroom is due. Cuckoo placement is not bit-stable
under insertion order, but the REPRESENTED SET — the min-bucket-canonical
``(bucket, fp)`` codes across table slots and stash — is order-invariant,
which is what the incremental-update test asserts against a full rebuild.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webcrawler_spark.functions.bloom import shard_of

_SLOTS = 4
_MAX_KICKS = 200
# Knuth multiplicative hash of the fingerprint for the partner bucket
_FP_MIX = np.uint64(0x5BD1E995)


def _fp_of(hv: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the top bits of xxhash64."""
    fp = (hv >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _i1_of(hv: np.ndarray, m: int) -> np.ndarray:
    return (hv & np.uint64(m - 1)).astype(np.int64)


def _i2_of(i1: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    mix = (fp.astype(np.uint64) * _FP_MIX) & np.uint64(m - 1)
    return (i1.astype(np.uint64) ^ mix).astype(np.int64)


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _stash_code(bucket: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    """Canonical stash entry for a (bucket, fingerprint): the SMALLER of
    the entry's two home buckets << 16 | fp. The stash must store
    (bucket, fp) — not the original item's raw hash — because when the
    kick loop exhausts, the fingerprint left in hand belongs to some
    *evicted victim*, whose original key is unknown (the classic cuckoo
    'victim cache'). Canonicalizing on min(i1, i2) lets a lookup compute
    the same code from either side of the involution."""
    partner = _i2_of(bucket, fp.astype(np.uint16), m)
    bmin = np.minimum(bucket, partner)
    return bmin * np.int64(65536) + fp.astype(np.int64)


def _bulk_place(table: np.ndarray, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Vectorized one-round placement: for each (bucket, fp) try the free
    slots of ``idx``'s bucket by within-bucket rank. Returns the boolean
    placed-mask; callers retry the rest against the partner bucket or the
    kick loop. Duplicate (bucket, fp) pairs are pre-collapsed by callers."""
    if len(idx) == 0:
        return np.zeros(0, dtype=bool)
    occ = (table != 0).sum(axis=1).astype(np.int64)
    order = np.argsort(idx, kind="stable")
    si = idx[order]
    # rank of each row within its bucket group
    boundary = np.ones(len(si), dtype=bool)
    boundary[1:] = si[1:] != si[:-1]
    grp_start = np.flatnonzero(boundary)
    rank = np.arange(len(si)) - np.repeat(grp_start, np.diff(np.append(grp_start, len(si))))
    slot = occ[si] + rank
    ok = slot < _SLOTS
    table[si[ok], slot[ok]] = fp[order][ok]
    placed = np.zeros(len(idx), dtype=bool)
    placed[order[ok]] = True
    return placed


def _insert_all(table: np.ndarray, hv: np.ndarray) -> list[int]:
    """Bulk insert: i1 round, i2 round, then scalar kicks for the rest.
    Returns the stash codes (``_stash_code``) of entries that could not
    be placed — NOTE these are victim-cache (bucket, fp) entries, which
    after an exhausted kick chain belong to a displaced victim, not
    necessarily the item that triggered the chain."""
    m = table.shape[0]
    fp = _fp_of(hv)
    i1 = _i1_of(hv, m)
    # a (bucket, fp) pair already representable once is a duplicate insert —
    # the filter is a set of fingerprints, keep one copy (delete removes one)
    _, uniq = np.unique(np.stack([i1, fp.astype(np.int64)]), axis=1, return_index=True)
    fp, i1 = fp[uniq], i1[uniq]
    placed = _bulk_place(table, i1, fp)
    fp2 = fp[~placed]
    i2 = _i2_of(i1[~placed], fp2, m)
    placed2 = _bulk_place(table, i2, fp2)
    stash: list[int] = []
    for f0, i0 in zip(fp2[~placed2], i2[~placed2]):
        cur, i = np.uint16(f0), int(i0)
        for _ in range(_MAX_KICKS):
            row = table[i]
            free = np.flatnonzero(row == 0)
            if len(free):
                table[i, free[0]] = cur
                cur = None
                break
            # evict a pseudo-random victim (deterministic: slot from fp)
            victim = int(cur) % _SLOTS
            cur, table[i, victim] = row[victim], cur
            i = int(_i2_of(np.array([i]), np.array([cur], dtype=np.uint16), m)[0])
        if cur is not None:
            stash.append(int(_stash_code(
                np.array([i]), np.array([cur], dtype=np.uint16), m)[0]))
    return stash


def _canonical_codes(table: np.ndarray, stash: np.ndarray) -> set[int]:
    """The set a shard REPRESENTS, invariant under insertion order: every
    stored fingerprint (table slot or stash entry) as its min-bucket
    canonical code ``min(i, partner(i, fp)) << 16 | fp``. Two shards with
    equal canonical-code sets answer every ``_contains`` query equally."""
    m = table.shape[0]
    i, slot = np.nonzero(table)
    fp = table[i, slot]
    codes = set(_stash_code(i.astype(np.int64), fp, m).tolist())
    codes.update(int(c) for c in stash)
    return codes


def _contains(table: np.ndarray, stash: np.ndarray, hv: np.ndarray) -> np.ndarray:
    m = table.shape[0]
    fp = _fp_of(hv)
    i1 = _i1_of(hv, m)
    i2 = _i2_of(i1, fp, m)
    hit = (table[i1] == fp[:, None]).any(axis=1)
    hit |= (table[i2] == fp[:, None]).any(axis=1)
    if len(stash):
        hit |= np.isin(_stash_code(i1, fp, m), stash)
    return hit


_CUCKOO_CACHE: OrderedDict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = OrderedDict()
_CUCKOO_CACHE_MAX = 8


def _shard_file(path: str, shard: int) -> str:
    return os.path.join(path, f"cuckoo_{shard:06d}.npz")


def _load_shard(path: str, shard: int, m: int) -> tuple[np.ndarray, np.ndarray]:
    key = (path, shard)
    hit = _CUCKOO_CACHE.get(key)
    if hit is not None:
        _CUCKOO_CACHE.move_to_end(key)
        return hit
    f = _shard_file(path, shard)
    if os.path.exists(f):
        with np.load(f) as z:
            val = (z["table"], z["stash"])
    else:
        val = (np.zeros((m, _SLOTS), dtype=np.uint16), np.zeros(0, dtype=np.int64))
    _CUCKOO_CACHE[key] = val
    while len(_CUCKOO_CACHE) > _CUCKOO_CACHE_MAX:
        _CUCKOO_CACHE.popitem(last=False)
    return val


def _read_shard_file(path: str, shard: int, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Read a shard file DIRECTLY, never through the probe LRU — for
    mutators (delete, incremental update). ``_save_shard`` can only
    invalidate the cache of the worker that ran the write task, so a
    mutator reading another worker's warm cache would base its rewrite on
    a pre-mutation table and resurrect removed fingerprints. (Stale probe
    caches are safe the other way: a superset table yields only false
    positives, which the exact confirm join absorbs.) Returns a private
    mutable (table, stash)."""
    f = _shard_file(path, shard)
    if os.path.exists(f):
        with np.load(f) as z:
            return z["table"].copy(), z["stash"]
    return (np.zeros((m, _SLOTS), dtype=np.uint16), np.zeros(0, dtype=np.int64))


def _delete_from(table: np.ndarray, stash: np.ndarray,
                 hv: np.ndarray) -> tuple[np.ndarray, int]:
    """Remove ONE resident copy per key of ``hv`` from the shard
    (mutating ``table`` in place — callers pass a private copy) and
    return ``(new_stash, n_removed)``. Entries resident in the stash
    leave via the stash ONLY (stash codes were never placed in the
    table, and the fingerprint could alias another URL's table copy);
    the rest drop one matching table slot from either home bucket."""
    m = table.shape[0]
    removed = 0
    fp = _fp_of(hv)
    i1 = _i1_of(hv, m)
    if len(stash):
        codes = _stash_code(i1, fp, m)
        stash_list = stash.tolist()
        dropped = np.zeros(len(hv), dtype=bool)
        for j, c in enumerate(codes):
            try:
                stash_list.remove(int(c))
            except ValueError:
                continue
            dropped[j] = True
            removed += 1
        stash = np.array(stash_list, dtype=np.int64)
        fp, i1 = fp[~dropped], i1[~dropped]
    i2 = _i2_of(i1, fp, m)
    for f, a, b in zip(fp, i1, i2):
        for i in (a, b):
            sl = np.flatnonzero(table[i] == f)
            if len(sl):
                table[i, sl[0]] = 0
                removed += 1
                break
    return stash, removed


def _save_shard(path: str, shard: int, table: np.ndarray, stash: np.ndarray) -> None:
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".tmp")
    with os.fdopen(fd, "wb") as fh:
        np.savez(fh, table=table, stash=stash)
    os.replace(tmp, _shard_file(path, shard))
    _CUCKOO_CACHE.pop((path, shard), None)


class ShardedCuckooSidecar:
    """K per-shard cuckoo tables on shared storage, probed lazily —
    drop-in alternative to ``ShardedBloomSidecar`` (same ``probe``
    contract; additionally supports ``delete``)."""

    def __init__(self, path: str, n_shards: int, m_buckets: int,
                 n_items: int | None = None, capacity: int | None = None):
        self.path = path
        self.n_shards = n_shards
        self.m_buckets = m_buckets  # buckets per shard (power of two)
        # fill accounting for the incremental-update path, same contract
        # as the Bloom sibling: n_items counts fingerprints resident,
        # capacity what the layout was SIZED for. Past capacity the load
        # factor approaches the cuckoo limit (~0.95 at 4 slots) and kick
        # chains start stashing — a cost signal only (the exact confirm
        # join guarantees results); ``overfull`` tells the maintainer to
        # do a fresh full build with more headroom.
        self.n_items = n_items
        self.capacity = capacity

    @property
    def overfull(self) -> bool:
        return (self.n_items is not None and self.capacity is not None
                and self.n_items > self.capacity)

    def might_contain(self, hash_col: Column, shard_col: Column) -> Column:
        path, m = self.path, self.m_buckets

        @F.pandas_udf(T.BooleanType())
        def _mc(h: pd.Series, s: pd.Series) -> pd.Series:
            hv = h.to_numpy(dtype=np.int64).view(np.uint64)
            sv = s.to_numpy(dtype=np.int64)
            out = np.zeros(len(hv), dtype=bool)
            for shard in np.unique(sv):
                table, stash = _load_shard(path, int(shard), m)
                mask = sv == shard
                out[mask] = _contains(table, stash, hv[mask])
            return pd.Series(out)

        return _mc(hash_col, shard_col)

    def probe(self, url_col: Column) -> Column:
        return self.might_contain(
            F.xxhash64(url_col), shard_of(url_col, self.n_shards)
        )

    def delete_guarded(self, evict_df: DataFrame, keep_df: DataFrame,
                       col: str = "url") -> int:
        """``delete`` restricted to fingerprints NO surviving key aliases
        — the safe form for seen-set eviction (TTL re-crawl).

        Why the guard exists: the bulk insert stores ONE copy per
        (bucket, fingerprint) code (set semantics), so two distinct URLs
        whose hashes alias to the same code share a single resident copy.
        An unguarded delete of one of them would drop the shared copy and
        make the OTHER — still-seen — URL a false negative, which the
        prefilter routing contract cannot absorb (a false-negative
        candidate checks only the since-build delta, not the full seen
        set, so the seen URL would be re-admitted). At 16-bit
        fingerprints an alias needs equal fp AND a shared home bucket —
        rare, but ~n²/(2^17·m) expected pairs per shard is non-negligible
        at 10^10 keys.

        The guard: compute each key's canonical code (the exact
        ``_stash_code`` the shard stores), broadcast the eviction batch's
        (shard, code) pairs, and scan ``keep_df`` once to find codes a
        surviving key aliases; those evictions are SKIPPED — they stay
        resident as stale superset entries, which cost confirm-join
        traffic and never affect results (the same graceful degradation
        the Bloom layout has for every eviction). Cost: one projected
        scan of ``keep_df`` + one broadcast join per eviction batch; no
        full-table shuffle — measured 7.5 s for a 1M-URL eviction against
        15M survivors at 16 cores, 40 aliases blocked (0.004%), zero
        survivor false negatives (BASELINE.md "Re-crawl eviction cost").
        Returns #fingerprints actually removed."""
        K, m = self.n_shards, self.m_buckets

        @F.pandas_udf(T.LongType())
        def code_of(h: pd.Series) -> pd.Series:
            hv = h.to_numpy(dtype=np.int64).view(np.uint64)
            if len(hv) == 0:
                return pd.Series(np.zeros(0, dtype=np.int64))
            return pd.Series(_stash_code(_i1_of(hv, m), _fp_of(hv), m))

        ev = evict_df.select(
            F.col(col),
            shard_of(F.col(col), K).alias("s"),
            code_of(F.xxhash64(F.col(col))).alias("c"),
        ).persist()
        try:
            ev_codes = ev.select("s", "c").distinct()
            blocked = (
                keep_df.select(
                    shard_of(F.col(col), K).alias("s"),
                    code_of(F.xxhash64(F.col(col))).alias("c"),
                )
                .join(F.broadcast(ev_codes), ["s", "c"], "left_semi")
                .distinct()
            )
            safe = ev.join(F.broadcast(blocked), ["s", "c"], "left_anti") \
                     .select(col)
            return self.delete(safe, col)
        finally:
            ev.unpersist()

    def delete(self, df: DataFrame, col: str = "url") -> int:
        """Remove the rows' fingerprints (one copy each) from their
        shards — the re-crawl eviction path Bloom cannot serve. Runs as a
        shard-partitioned job (each shard file rewritten by exactly one
        task, tmp + atomic rename). Returns #fingerprints removed."""
        path, n_shards, m = self.path, self.n_shards, self.m_buckets

        def drop(batches):
            removed = 0
            by_shard: dict[int, list[np.ndarray]] = {}
            for pdf in batches:
                for s, grp in pdf.groupby("s"):
                    by_shard.setdefault(int(s), []).append(
                        grp["h"].to_numpy(dtype=np.int64).view(np.uint64))
            for s, parts in by_shard.items():
                hv = np.concatenate(parts)
                # direct file read — a warm probe-LRU entry from before an
                # earlier delete would resurrect its removals (see
                # _read_shard_file)
                table, stash = _read_shard_file(path, s, m)
                stash, n = _delete_from(table, stash, hv)
                removed += n
                _save_shard(path, s, table, stash)
            yield pd.DataFrame({"n": [removed]})

        out = (
            df.select(
                shard_of(F.col(col), n_shards).alias("s"),
                F.xxhash64(F.col(col)).alias("h"),
            )
            .repartition(n_shards, "s")
            .mapInPandas(drop, schema="n long")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        removed = int(out[0]["n"] or 0)
        if self.n_items is not None:
            self.n_items = max(0, self.n_items - removed)
            _write_meta(self.path, self.n_shards, self.m_buckets,
                        self.n_items, self.capacity)
        return removed

    def destroy(self):
        shutil.rmtree(self.path, ignore_errors=True)


def load_sharded_cuckoo(path: str) -> ShardedCuckooSidecar | None:
    """Open a previously built sidecar from its ``_META`` marker (written
    last, after every shard file's atomic rename — presence certifies the
    build completed). Returns None if no completed build is at ``path``."""
    from webcrawler_spark.functions.bloom import read_sidecar_meta

    m = read_sidecar_meta(path)
    if m is None or "m_buckets" not in m:  # absent, or the bloom layout
        return None
    return ShardedCuckooSidecar(path, m["n_shards"], m["m_buckets"],
                                m.get("n_items"), m.get("capacity"))


def _write_meta(path: str, n_shards: int, m_buckets: int,
                n_items: int | None, capacity: int | None) -> None:
    from webcrawler_spark.functions.bloom import write_sidecar_meta

    write_sidecar_meta(path, {"n_shards": n_shards, "m_buckets": m_buckets,
                              "n_items": n_items, "capacity": capacity})


def build_sharded_cuckoo(
    df: DataFrame,
    col: str = "url",
    path: str | None = None,
    n_shards: int | None = None,
    expected_items: int | None = None,
    reuse_existing: bool = False,
    headroom: float = 1.0,
    dir: str | None = None,
) -> ShardedCuckooSidecar:
    """Distributed partitioned cuckoo build — same one-shuffle dataflow as
    ``build_sharded_bloom``: (shard, hash) pairs co-locate under a
    shard-keyed repartition; each task bulk-inserts its shards' hashes and
    publishes one ``.npz`` per shard atomically.

    ``reuse_existing=True`` returns the completed sidecar already at
    ``path`` (via its ``_META`` marker) instead of rebuilding.
    ``headroom`` over-sizes the layout (e.g. 2.0 = room to double) so the
    sidecar can then be maintained incrementally with
    ``update_sharded_cuckoo`` instead of rebuilt per round."""
    spark = df.sparkSession
    if reuse_existing and path is not None:
        existing = load_sharded_cuckoo(path)
        # layout must match what THIS call would build (see the bloom
        # sibling); content staleness is the caller's path-keying contract
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
        path = tempfile.mkdtemp(prefix="cuckoo_sidecar_", dir=dir)
    os.makedirs(path, exist_ok=True)
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if expected_items is None:
        expected_items = df.count()
    capacity = max(1, int(expected_items * headroom))
    per_shard = max(_SLOTS, int(capacity / n_shards * 1.2) + _SLOTS)
    m = _next_pow2((per_shard + _SLOTS - 1) // _SLOTS)

    def write_shards(batches):
        by_shard: dict[int, list[np.ndarray]] = {}
        for pdf in batches:
            for s, grp in pdf.groupby("s"):
                by_shard.setdefault(int(s), []).append(
                    grp["h"].to_numpy(dtype=np.int64).view(np.uint64))
        out_s, out_n = [], []
        for s, parts in by_shard.items():
            hv = np.concatenate(parts)
            table = np.zeros((m, _SLOTS), dtype=np.uint16)
            stash = np.array(_insert_all(table, hv), dtype=np.int64)
            _save_shard(path, s, table, stash)
            out_s.append(s)
            out_n.append(len(hv))
        yield pd.DataFrame({"s": out_s, "n": out_n})

    data = df.select(
        shard_of(F.col(col), n_shards).alias("s"),
        F.xxhash64(F.col(col)).alias("h"),
    ).repartition(n_shards, "s")
    # one row per shard — the sum is the inserted row count, free with
    # the action that drives the write; marker LAST certifies completion
    inserted = int(data.mapInPandas(
        write_shards, schema="s int, n long").toPandas()["n"].sum())
    _write_meta(path, n_shards, m, inserted, capacity)
    return ShardedCuckooSidecar(path, n_shards, m, inserted, capacity)


def update_sharded_cuckoo(
    sidecar: ShardedCuckooSidecar, df: DataFrame, col: str = "url",
    dir: str | None = None,
) -> ShardedCuckooSidecar:
    """Incremental carried-state maintenance, sibling of
    ``update_sharded_bloom``: insert the delta's fingerprints into a
    COPY-ON-WRITE successor of ``sidecar``. Only delta-touched shards are
    rewritten; untouched shard files hard-link into the new version
    directory (copy fallback across filesystems) — O(delta + touched
    shards), not O(seen). The old path stays intact until the caller
    destroys it (worker shard LRUs key on (path, shard), so in-flight
    probes of the old version stay consistent).

    Delta keys whose ``(bucket, fp)`` code is already represented are
    skipped (``_contains`` pre-check), preserving the filter's
    set-of-fingerprints semantics — so the successor REPRESENTS exactly
    the canonical-code set a full rebuild of old ∪ delta at the same
    layout would (asserted in tests/test_bloom_seen.py; slot arrangement
    may differ, answers cannot). ``n_items`` advances by the count of
    codes actually inserted; check ``overfull`` afterwards."""
    old_path = sidecar.path
    n_shards, m = sidecar.n_shards, sidecar.m_buckets
    new_path = tempfile.mkdtemp(prefix="cuckoo_sidecar_", dir=dir)

    def ins_into(batches):
        by_shard: dict[int, list[np.ndarray]] = {}
        for pdf in batches:
            for s, grp in pdf.groupby("s"):
                by_shard.setdefault(int(s), []).append(
                    grp["h"].to_numpy(dtype=np.int64).view(np.uint64))
        out_s, out_n = [], []
        for s, parts in by_shard.items():
            hv = np.concatenate(parts)
            # direct file read, never the probe LRU (_read_shard_file):
            # a cached pre-delete table here would resurrect evicted
            # fingerprints into the successor version
            table, stash = _read_shard_file(old_path, s, m)
            # skip keys the shard already represents (set semantics);
            # _insert_all dedups the rest within the delta itself
            fresh = hv[~_contains(table, stash, hv)]
            extra = _insert_all(table, fresh)
            if extra:
                stash = np.concatenate(
                    [stash, np.array(extra, dtype=np.int64)])
            _save_shard(new_path, s, table, stash)
            out_s.append(s)
            # count of canonical codes actually added = unique fresh codes
            fp = _fp_of(fresh)
            codes = _stash_code(_i1_of(fresh, m), fp, m)
            out_n.append(len(np.unique(codes)))
        yield pd.DataFrame({"s": out_s, "n": out_n})

    data = df.select(
        shard_of(F.col(col), n_shards).alias("s"),
        F.xxhash64(F.col(col)).alias("h"),
    ).repartition(n_shards, "s")
    touched = data.mapInPandas(ins_into, schema="s int, n long").toPandas()
    touched_ids = set(int(s) for s in touched["s"])
    if not touched_ids:
        # empty delta: hand the ORIGINAL version back, no churn (callers
        # only destroy the old version when the update returned a new one)
        shutil.rmtree(new_path, ignore_errors=True)
        return sidecar
    from webcrawler_spark.functions.bloom import link_untouched_shards

    link_untouched_shards(old_path, new_path, _shard_file,
                          n_shards, touched_ids)
    n_items = (None if sidecar.n_items is None
               else sidecar.n_items + int(touched["n"].sum()))
    _write_meta(new_path, n_shards, m, n_items, sidecar.capacity)
    return ShardedCuckooSidecar(new_path, n_shards, m,
                                n_items, sidecar.capacity)
