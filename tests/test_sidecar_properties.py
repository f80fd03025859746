"""Property-based tests (hypothesis) for the pure-numpy cores of the two
seen-set sidecar layouts. These run without Spark, so hypothesis can
hammer hundreds of adversarial inputs per property — including the
overload regimes (tiny tables, huge deltas) the Spark-level equality
tests can't afford to sweep.

The invariants are the load-bearing ones for crawl correctness:

* Bloom: set-then-test never false-negative, and OR-merging deltas is a
  superset (the incremental-update contract).
* Cuckoo: the REPRESENTED SET — min-bucket-canonical (bucket, fp) codes
  across table slots and stash — is exactly the inserted codes,
  regardless of insertion order or overload (exhausted kick chains must
  stash the displaced victim, a bug class a fixed fixture once missed);
  deletes remove exactly the requested codes and nothing else.

False POSITIVES are allowed by contract everywhere (the exact confirm
join absorbs them); false negatives anywhere re-admit seen URLs.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from webcrawler_spark.functions.bloom import _or_bits, _test_bits
from webcrawler_spark.functions.cuckoo import (
    _SLOTS,
    _canonical_codes,
    _contains,
    _delete_from,
    _fp_of,
    _i1_of,
    _insert_all,
    _stash_code,
)

# raw xxhash64 values as the kernels see them (any 64-bit pattern)
HASHES = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=300
)
# m must be a power of two (partner bucket is an XOR involution); m=8
# with 300 keys is ~9x overload — the stash-pressure regime
M_BUCKETS = st.sampled_from([8, 32, 128, 1024])


def _hv(xs: list[int]) -> np.ndarray:
    return np.array(xs, dtype=np.uint64)


def _codes_of(hv: np.ndarray, m: int) -> set[int]:
    if len(hv) == 0:
        return set()
    return set(_stash_code(_i1_of(hv, m), _fp_of(hv), m).tolist())


# ---------------------------------------------------------------------------
# Bloom bitset core
# ---------------------------------------------------------------------------


@given(HASHES, st.integers(min_value=1, max_value=8),
       st.sampled_from([1, 4, 64]))
@settings(max_examples=300, deadline=None)
def test_bloom_set_then_test_never_false_negative(xs, k, n_words):
    hv = _hv(xs)
    m_bits = n_words * 64
    words = np.zeros(n_words, dtype=np.uint64)
    _or_bits(words, hv, k, m_bits)
    assert _test_bits(words, hv, k, m_bits).all()


@given(HASHES, HASHES, st.integers(min_value=1, max_value=8))
@settings(max_examples=200, deadline=None)
def test_bloom_incremental_or_equals_full_build(xs, delta, k):
    """OR-ing a delta into an existing bitset == building base ∪ delta in
    one pass (the bit-identity update_sharded_bloom relies on), and the
    result still answers True for every base key (supersets only)."""
    n_words, m_bits = 16, 16 * 64
    base, dv = _hv(xs), _hv(delta)
    incremental = np.zeros(n_words, dtype=np.uint64)
    _or_bits(incremental, base, k, m_bits)
    _or_bits(incremental, dv, k, m_bits)
    full = np.zeros(n_words, dtype=np.uint64)
    _or_bits(full, np.concatenate([base, dv]), k, m_bits)
    assert np.array_equal(incremental, full)
    assert _test_bits(incremental, base, k, m_bits).all()
    assert _test_bits(incremental, dv, k, m_bits).all()


# ---------------------------------------------------------------------------
# Cuckoo table core
# ---------------------------------------------------------------------------


@given(HASHES, M_BUCKETS)
@settings(max_examples=300, deadline=None)
def test_cuckoo_represents_exactly_the_inserted_codes(xs, m):
    """After any bulk insert — including overload, where kick chains
    exhaust and stash victims — the represented set equals the input
    codes exactly: nothing lost (false negatives), nothing invented."""
    hv = _hv(xs)
    table = np.zeros((m, _SLOTS), dtype=np.uint16)
    stash = np.array(_insert_all(table, hv), dtype=np.int64)
    assert _canonical_codes(table, stash) == _codes_of(hv, m)
    # and the membership probe agrees: no false negatives
    assert _contains(table, stash, hv).all()


@given(HASHES, M_BUCKETS, st.randoms(use_true_random=False))
@settings(max_examples=150, deadline=None)
def test_cuckoo_represented_set_is_insertion_order_invariant(xs, m, rnd):
    """Cuckoo PLACEMENT depends on insertion order (kicks), but the
    represented set must not — the incremental-update test's rebuild
    comparison and any replayed/resumed build depend on this."""
    hv = _hv(xs)
    perm = np.arange(len(hv))
    rnd.shuffle(perm)
    t1 = np.zeros((m, _SLOTS), dtype=np.uint16)
    s1 = np.array(_insert_all(t1, hv), dtype=np.int64)
    t2 = np.zeros((m, _SLOTS), dtype=np.uint16)
    s2 = np.array(_insert_all(t2, hv[perm]), dtype=np.int64)
    assert _canonical_codes(t1, s1) == _canonical_codes(t2, s2)


@given(HASHES, HASHES, M_BUCKETS)
@settings(max_examples=300, deadline=None)
def test_cuckoo_delete_removes_exactly_the_victims(keep, drop, m):
    """Deleting the drop keys leaves the represented set of the keep keys
    untouched (when their code sets are disjoint — with a shared code,
    dropping the surviving alias is inherent cuckoo semantics, which the
    engine accepts because the exact seen state is the source of truth)."""
    kv, dv = _hv(keep), _hv(drop)
    ck, cd = _codes_of(kv, m), _codes_of(dv, m)
    kv = kv[~np.isin(_codes_arr(kv, m), list(ck & cd))] if ck & cd else kv
    ck = _codes_of(kv, m)
    table = np.zeros((m, _SLOTS), dtype=np.uint16)
    stash = np.array(_insert_all(table, np.concatenate([kv, dv])),
                     dtype=np.int64)
    stash, removed = _delete_from(table, stash, dv)
    assert _canonical_codes(table, stash) == ck
    # one resident copy per unique (bucket, fp) placement of the drop set
    n_copies = (np.unique(np.stack([_i1_of(dv, m),
                                    _fp_of(dv).astype(np.int64)]),
                          axis=1).shape[1] if len(dv) else 0)
    assert removed == n_copies
    if len(kv):
        assert _contains(table, stash, kv).all()


def _codes_arr(hv: np.ndarray, m: int) -> np.ndarray:
    if len(hv) == 0:
        return np.zeros(0, dtype=np.int64)
    return _stash_code(_i1_of(hv, m), _fp_of(hv), m)


@given(HASHES, HASHES, M_BUCKETS)
@settings(max_examples=300, deadline=None)
def test_cuckoo_guarded_delete_leaves_exactly_the_survivor_codes(keep, drop, m):
    """The delete_guarded rule — skip any eviction whose code a surviving
    key aliases — leaves the represented set EXACTLY equal to the
    survivors' codes (blocked evictions are already survivor codes), with
    no false negatives for survivors even under heavy aliasing. This is
    the pure-core form of ShardedCuckooSidecar.delete_guarded."""
    kv, dv = _hv(keep), _hv(drop)
    ck = _codes_of(kv, m)
    safe = dv[~np.isin(_codes_arr(dv, m), list(ck))] if len(dv) else dv
    table = np.zeros((m, _SLOTS), dtype=np.uint16)
    stash = np.array(_insert_all(table, np.concatenate([kv, dv])),
                     dtype=np.int64)
    stash, _ = _delete_from(table, stash, safe)
    assert _canonical_codes(table, stash) == ck
    if len(kv):
        assert _contains(table, stash, kv).all()


@given(HASHES, M_BUCKETS)
@settings(max_examples=150, deadline=None)
def test_cuckoo_delete_all_empties_the_shard(xs, m):
    hv = _hv(xs)
    table = np.zeros((m, _SLOTS), dtype=np.uint16)
    stash = np.array(_insert_all(table, hv), dtype=np.int64)
    stash, _ = _delete_from(table, stash, hv)
    assert _canonical_codes(table, stash) == set()
    assert not table.any() and len(stash) == 0
