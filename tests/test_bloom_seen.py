"""F5 Bloom-sidecar seen set (north_rule): the prefilter must never change
results — only route definitely-unseen candidates around the exact
anti-join. Checked at the operator level (kernel admission) and end-to-end
(bloom-enabled crawl == plain crawl == simulator)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.crawl.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.crawl.kernel import admission_kernel
from webcrawler_spark.functions.bloom import (
    anti_join_with_bloom,
    build_bloom,
    build_sharded_bloom,
)
from webcrawler_spark.sources.fixtures import SEED_URLS, make_webgraph
from webcrawler_spark.sources.simulator import simulate


def _cand_seen(spark):
    cand = spark.range(20_000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".gov.si/p"), F.col("id").cast("string")).alias("url"),
        F.col("id").alias("meta"),
    )
    seen = spark.range(0, 20_000, 3).select(
        F.concat(F.lit("http://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".gov.si/p"), F.col("id").cast("string")).alias("url")
    )
    return cand, seen


def test_bloom_anti_join_exact_equality(spark):
    """anti_join_with_bloom == plain LEFT ANTI, row for row (FPR routes
    rows to the confirm join, never into or out of the result)."""
    cand, seen = _cand_seen(spark)
    sidecar = build_bloom(seen, "url", fpp=0.05)
    plain = {tuple(r) for r in cand.join(seen, "url", "left_anti").collect()}
    bloomed = {tuple(r) for r in anti_join_with_bloom(cand, seen, "url", sidecar).collect()}
    assert bloomed == plain and len(plain) > 0
    sidecar.destroy()


def test_sharded_bloom_anti_join_exact_equality(spark):
    """The sharded (partitioned) sidecar routes identically to the dense
    broadcast one: anti_join_with_bloom == plain LEFT ANTI, and a member
    probe never returns false (no false negatives by construction)."""
    cand, seen = _cand_seen(spark)
    sidecar = build_sharded_bloom(seen, "url", n_shards=13, fpp=0.05)
    try:
        plain = {tuple(r) for r in cand.join(seen, "url", "left_anti").collect()}
        bloomed = {
            tuple(r) for r in anti_join_with_bloom(cand, seen, "url", sidecar).collect()
        }
        assert bloomed == plain and len(plain) > 0
        # every true member must probe True
        n_members = seen.count()
        n_true = (
            seen.withColumn("m", sidecar.probe(F.col("url")))
            .filter("m").count()
        )
        assert n_true == n_members
    finally:
        sidecar.destroy()


def test_sharded_bloom_incremental_update_bit_identical(spark):
    """update_sharded_bloom (the engine's per-truncation carried-state
    maintenance) is BIT-IDENTICAL to a full rebuild of old ∪ delta at the
    same layout: every shard file equal, version accounting advances, and
    the old version's files stay intact until destroyed."""
    import os

    import numpy as np

    from webcrawler_spark.functions.bloom import (
        _shard_file, load_sharded_bloom, update_sharded_bloom)

    _, seen = _cand_seen(spark)
    base = seen.filter(F.xxhash64("url") % 3 != 0)
    delta = seen.filter(F.xxhash64("url") % 3 == 0)
    total = seen.count()
    n_shards = 13
    # identical sizing on both sides — layout is what update preserves
    s_full = build_sharded_bloom(seen, "url", n_shards=n_shards,
                                 expected_items=total, fpp=0.05)
    s_base = build_sharded_bloom(base, "url", n_shards=n_shards,
                                 expected_items=total, fpp=0.05)
    s_upd = update_sharded_bloom(s_base, delta, "url")
    try:
        assert (s_upd.n_shards, s_upd.n_words, s_upd.k) == \
            (s_full.n_shards, s_full.n_words, s_full.k)
        for s in range(n_shards):
            ff, fu = _shard_file(s_full.path, s), _shard_file(s_upd.path, s)
            a = np.load(ff) if os.path.exists(ff) else None
            b = np.load(fu) if os.path.exists(fu) else None
            if a is None or b is None:
                assert a is None and b is None, f"shard {s} presence differs"
            else:
                assert np.array_equal(a, b), f"shard {s} bits differ"
        # fill accounting: n_items advanced by the delta's row count
        assert s_upd.n_items == base.count() + delta.count()
        assert s_upd.capacity == s_base.capacity
        # the successor is a fresh path; the old version still loads
        assert s_upd.path != s_base.path
        assert load_sharded_bloom(s_base.path) is not None
        # no false negatives through the updated sidecar
        n_fn = seen.filter(~s_upd.probe(F.col("url"))).count()
        assert n_fn == 0
    finally:
        s_full.destroy()
        s_base.destroy()
        s_upd.destroy()


def test_sidecar_empty_delta_update_is_noop(spark):
    """An empty delta hands the ORIGINAL version back (no copy-on-write
    churn) for both layouts; a stale-pointer resume discards a sidecar
    that is a SUBSET of committed seen (probe-validation at load)."""
    from webcrawler_spark.functions.bloom import update_sharded_bloom
    from webcrawler_spark.functions.cuckoo import (
        build_sharded_cuckoo, update_sharded_cuckoo)

    _, seen = _cand_seen(spark)
    empty = spark.createDataFrame([], "url string")
    b = build_sharded_bloom(seen, "url", n_shards=5)
    c = build_sharded_cuckoo(seen, "url", n_shards=5)
    try:
        assert update_sharded_bloom(b, empty, "url") is b
        assert update_sharded_cuckoo(c, empty, "url") is c
    finally:
        b.destroy()
        c.destroy()


def test_cuckoo_delete_then_update_no_resurrection(spark):
    """update_sharded_cuckoo reads shard files directly (never the probe
    LRU), so fingerprints evicted by delete() stay deleted through the
    successor version even after prior probes warmed the cache."""
    from webcrawler_spark.functions.cuckoo import (
        build_sharded_cuckoo, update_sharded_cuckoo)

    _, seen = _cand_seen(spark)
    # same layout as test_sharded_cuckoo_delete: collision-free for this
    # deterministic fixture (delete of an aliased (bucket, fp) would
    # legitimately drop the surviving alias — inherent cuckoo semantics)
    sidecar = build_sharded_cuckoo(seen, "url", n_shards=7)
    s2 = None
    try:
        # warm the worker-side shard caches with a probe pass
        seen.withColumn("m", sidecar.probe(F.col("url"))).filter("m").count()
        evict = seen.filter(F.xxhash64("url") % 5 == 0)
        sidecar.delete(evict, "url")
        delta = spark.createDataFrame(
            [("http://hnew.gov.si/x",)], "url string")
        s2 = update_sharded_cuckoo(sidecar, delta, "url")
        n_back = evict.withColumn(
            "m", s2.probe(F.col("url"))).filter("m").count()
        assert n_back == 0, "deleted fingerprints resurrected by update"
        assert s2.probe is not None and s2.path != sidecar.path
        n_fn = seen.subtract(evict).filter(~s2.probe(F.col("url"))).count()
        assert n_fn == 0
    finally:
        sidecar.destroy()
        if s2 is not None:
            s2.destroy()


def test_bloom_kernel_admission_equality(spark):
    a = admission_kernel(spark, 200_000, 100_000, use_bloom=False)
    b = admission_kernel(spark, 200_000, 100_000, use_bloom=True)
    ra = {tuple(r) for r in a.collect()}
    rb = {tuple(r) for r in b.collect()}
    assert ra == rb and len(ra) > 100_000


@pytest.mark.slow
def test_bloom_crawl_matches_simulator(spark, tmp_path_factory):
    """End-to-end: a bloom-prefiltered crawl reproduces the simulator's
    seen set and page census exactly (FPR must not change results)."""
    wg, robots = make_webgraph(n_hosts=5, pages_per_host_base=6)
    sim = simulate(wg, robots, list(SEED_URLS), max_rounds=120)
    root = str(tmp_path_factory.mktemp("bloom_crawl"))
    eng = CrawlEngine(
        spark,
        spark.createDataFrame(wg),
        spark.createDataFrame(robots),
        list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=120, checkpoint_every=5,
                    collect_metrics=False, use_bloom_prefilter=True),
    )
    eng.run()
    eseen = {r["url"] for r in eng.seen_df().collect()}
    assert eseen == sim.seen
    epages = {(r["url"], r["page_type_code"]) for r in eng.pages_df().collect()}
    spages = {(u, v["page_type_code"]) for u, v in sim.pages.items()}
    assert epages == spages


@pytest.mark.slow
def test_bloom_crawl_resume_reuses_sidecar(spark, tmp_path_factory):
    """Kill-and-resume with the prefilter on: the resumed driver REOPENS
    the persisted sidecar version from the manifest (carried state — no
    full rebuild) and still finishes with the simulator's exact seen set
    and trace. The persisted version was refreshed at a truncation at or
    after the resume cursor, i.e. a superset of committed seen — the test
    proves supersets stay result-invariant end to end."""
    wg, robots = make_webgraph(n_hosts=5, pages_per_host_base=6)
    sim = simulate(wg, robots, list(SEED_URLS), max_rounds=120)
    root = str(tmp_path_factory.mktemp("bloom_resume"))
    wg_df, robots_df = spark.createDataFrame(wg), spark.createDataFrame(robots)
    # phase 1: "crash" after 6 rounds, committing every 2
    eng1 = CrawlEngine(
        spark, wg_df, robots_df, list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=6, checkpoint_every=2,
                    collect_metrics=False, use_bloom_prefilter=True),
    )
    eng1.run()
    eng2 = CrawlEngine(
        spark, wg_df, robots_df, list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=120, checkpoint_every=4,
                    collect_metrics=False, use_bloom_prefilter=True),
        resume=True,
    )
    # the carried filter came back from the manifest pointer, not a rebuild
    assert eng2._sidecar is not None
    assert eng2._sidecar.path == eng2.store.get_meta("sidecar_path")
    assert eng2._sidecar.path.startswith(root)
    eng2.run()
    eseen = {r["url"] for r in eng2.seen_df().collect()}
    assert eseen == sim.seen
    etrace = {(r["time_ms"], r["url"]) for r in eng2.trace_df().collect()}
    assert etrace == {(t, u) for (t, s, u, h) in sim.trace}
    # stale-pointer path: point the manifest at a sidecar that is a
    # SUBSET of committed seen (e.g. left behind by intervening runs with
    # the prefilter off) — resume must probe-validate and DISCARD it
    # (false negatives would re-admit seen URLs), falling back to a full
    # build at the first truncation
    bogus = build_sharded_bloom(
        spark.createDataFrame([("http://unrelated.gov.si/",)], "url string"),
        "url", n_shards=3)
    try:
        eng2.store.set_meta(sidecar_path=bogus.path)
        eng3 = CrawlEngine(
            spark, wg_df, robots_df, list(SEED_URLS),
            CrawlConfig(store_root=root, max_rounds=120, checkpoint_every=4,
                        collect_metrics=False, use_bloom_prefilter=True),
            resume=True,
        )
        assert eng3._sidecar is None
    finally:
        bogus.destroy()


def test_parquet_input_round_equals_synth(spark, tmp_path_factory):
    """run_round_kernel over parquet-materialized inputs (the timed bench
    shape — see kernel.py header) returns the same counts as the
    synth-fused form: materialization must be a pure I/O change."""
    from webcrawler_spark.crawl.kernel import (
        materialize_round_inputs, run_round_kernel)

    n = 100_000
    root = str(tmp_path_factory.mktemp("kernel_inputs"))
    materialize_round_inputs(spark, root, n, n // 2, n // 4, n_files=8)
    r_pq = run_round_kernel(spark, n, n // 2, n // 4, input_root=root)
    r_syn = run_round_kernel(spark, n, n // 2, n // 4)
    assert r_pq == r_syn
    assert r_pq["n_admitted"] > 0 and r_pq["n_duplicates"] > 0


def test_sharded_cuckoo_anti_join_exact_equality(spark):
    """The cuckoo sidecar (the north_rule's other named layout) satisfies
    the same contract as the Bloom ones: anti_join_with_bloom == plain
    LEFT ANTI, and no false negatives (every member probes True)."""
    from webcrawler_spark.functions.cuckoo import build_sharded_cuckoo

    cand, seen = _cand_seen(spark)
    sidecar = build_sharded_cuckoo(seen, "url", n_shards=13)
    try:
        plain = {tuple(r) for r in cand.join(seen, "url", "left_anti").collect()}
        routed = {
            tuple(r) for r in anti_join_with_bloom(cand, seen, "url", sidecar).collect()
        }
        assert routed == plain and len(plain) > 0
        n_members = seen.count()
        n_true = (
            seen.withColumn("m", sidecar.probe(F.col("url"))).filter("m").count()
        )
        assert n_true == n_members
        # FPR sanity: non-members mostly probe False (16-bit fingerprints,
        # theoretical ~2*4/2^16; allow generous slack)
        non = cand.join(seen, "url", "left_anti").select("url")
        n_non = non.count()
        n_fp = non.withColumn("m", sidecar.probe(F.col("url"))).filter("m").count()
        assert n_fp <= max(5, n_non * 0.01)
    finally:
        sidecar.destroy()


def test_sharded_cuckoo_delete(spark):
    """Deletion — the capability Bloom lacks (re-crawl eviction): deleted
    URLs probe False again while every remaining member still probes True."""
    from webcrawler_spark.functions.cuckoo import build_sharded_cuckoo

    _, seen = _cand_seen(spark)
    sidecar = build_sharded_cuckoo(seen, "url", n_shards=7)
    try:
        evict = seen.filter(F.xxhash64("url") % 5 == 0)
        keep = seen.filter(F.xxhash64("url") % 5 != 0)
        n_evict = evict.count()
        assert n_evict > 0
        removed = sidecar.delete(evict, "url")
        assert removed == n_evict
        # no false negatives among the survivors
        n_keep = keep.count()
        n_true = keep.withColumn("m", sidecar.probe(F.col("url"))).filter("m").count()
        assert n_true == n_keep
        # evicted rows are gone (up to fingerprint-collision survivors,
        # which for this deterministic fixture are zero)
        n_still = evict.withColumn("m", sidecar.probe(F.col("url"))).filter("m").count()
        assert n_still == 0
    finally:
        sidecar.destroy()


def test_sharded_cuckoo_incremental_update_represents_union(spark):
    """update_sharded_cuckoo REPRESENTS exactly what a full rebuild of
    old ∪ delta at the same layout represents: per-shard canonical
    (bucket, fp) code sets equal (slot arrangement may differ — cuckoo
    placement is insertion-order dependent; answers cannot), no false
    negatives, fill accounting advances, old version intact."""
    import numpy as np

    from webcrawler_spark.functions.cuckoo import (
        _canonical_codes, _shard_file, build_sharded_cuckoo,
        load_sharded_cuckoo, update_sharded_cuckoo)

    _, seen = _cand_seen(spark)
    base = seen.filter(F.xxhash64("url") % 3 != 0)
    delta = seen.filter(F.xxhash64("url") % 3 == 0)
    total = seen.count()
    n_shards = 13
    s_full = build_sharded_cuckoo(seen, "url", n_shards=n_shards,
                                  expected_items=total, headroom=2.0)
    s_base = build_sharded_cuckoo(base, "url", n_shards=n_shards,
                                  expected_items=total, headroom=2.0)
    s_upd = update_sharded_cuckoo(s_base, delta, "url")
    try:
        assert (s_upd.n_shards, s_upd.m_buckets) == \
            (s_full.n_shards, s_full.m_buckets)
        import os
        for s in range(n_shards):
            ff, fu = _shard_file(s_full.path, s), _shard_file(s_upd.path, s)
            have_f, have_u = os.path.exists(ff), os.path.exists(fu)
            assert have_f == have_u, f"shard {s} presence differs"
            if not have_f:
                continue
            with np.load(ff) as z:
                codes_f = _canonical_codes(z["table"], z["stash"])
            with np.load(fu) as z:
                codes_u = _canonical_codes(z["table"], z["stash"])
            assert codes_f == codes_u, f"shard {s} represented sets differ"
        # no false negatives through the updated sidecar
        n_fn = seen.filter(~s_upd.probe(F.col("url"))).count()
        assert n_fn == 0
        # accounting: capacity preserved, n_items advanced, successor at
        # a fresh path with the old version still loadable
        assert s_upd.capacity == s_base.capacity
        assert s_upd.n_items > s_base.n_items
        assert s_upd.path != s_base.path
        assert load_sharded_cuckoo(s_base.path) is not None
        # a delta re-applied to the successor is a no-op on the
        # represented set (set semantics: already-present codes skipped)
        s_upd2 = update_sharded_cuckoo(s_upd, delta, "url")
        try:
            assert s_upd2.n_items == s_upd.n_items
        finally:
            s_upd2.destroy()
    finally:
        s_full.destroy()
        s_base.destroy()
        s_upd.destroy()


@pytest.mark.slow
def test_cuckoo_crawl_matches_simulator(spark, tmp_path_factory):
    """End-to-end with the cuckoo sidecar selected: identical seen set and
    page census to the simulator (prefilter layout must not change results)."""
    wg, robots = make_webgraph(n_hosts=5, pages_per_host_base=6)
    sim = simulate(wg, robots, list(SEED_URLS), max_rounds=120)
    root = str(tmp_path_factory.mktemp("cuckoo_crawl"))
    eng = CrawlEngine(
        spark,
        spark.createDataFrame(wg),
        spark.createDataFrame(robots),
        list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=120, checkpoint_every=5,
                    collect_metrics=False, use_bloom_prefilter=True,
                    seen_filter="cuckoo"),
    )
    eng.run()
    eseen = {r["url"] for r in eng.seen_df().collect()}
    assert eseen == sim.seen
    epages = {(r["url"], r["page_type_code"]) for r in eng.pages_df().collect()}
    spages = {(u, v["page_type_code"]) for u, v in sim.pages.items()}
    assert epages == spages


def test_cuckoo_table_properties_no_spark():
    """Pure-numpy property test of the cuckoo table: across seeds and
    sizes, no false negatives (incl. kick-chain victim-cache entries),
    FPR near the 2b/2^f theory, duplicate inserts collapse to one copy."""
    import numpy as np

    from webcrawler_spark.functions.cuckoo import (
        _SLOTS, _contains, _insert_all, _next_pow2)

    for seed in range(4):
        rng = np.random.default_rng(seed)
        for n in (100, 5000, 100000):
            per = max(_SLOTS, int(n * 1.2) + _SLOTS)
            m = _next_pow2((per + _SLOTS - 1) // _SLOTS)
            table = np.zeros((m, _SLOTS), dtype=np.uint16)
            hv = rng.integers(0, 2**64, size=n, dtype=np.uint64)
            stash = np.array(_insert_all(table, hv), dtype=np.int64)
            assert _contains(table, stash, hv).all()
            other = rng.integers(0, 2**64, size=n, dtype=np.uint64)
            fresh = other[~np.isin(other, hv)]
            assert _contains(table, stash, fresh).mean() < 0.01
    table = np.zeros((_next_pow2(64), _SLOTS), dtype=np.uint16)
    hv = np.array([123456789] * 50 + [987654321] * 50, dtype=np.uint64)
    stash = np.array(_insert_all(table, hv), dtype=np.int64)
    assert (table != 0).sum() + len(stash) == 2


def test_skewed_round_bloom_equals_exact(spark, tmp_path_factory):
    """The adversarial-skew kernel inputs (half of all candidates on ONE
    host, all duplicate texts sharing ONE fingerprint — bench.py's
    kernel_skew section) produce identical counts with and without the
    Bloom prefilter, and the hot structures are really present: skew must
    cost throughput at most, never results."""
    from pyspark.sql import functions as F

    from webcrawler_spark.crawl.kernel import (
        materialize_round_inputs, run_round_kernel, synth_texts_skewed)

    n = 100_000
    root = str(tmp_path_factory.mktemp("kernel_inputs_skew"))
    materialize_round_inputs(spark, root, n, n // 2, n // 4, n_files=8,
                             skewed=True)
    r_bloom = run_round_kernel(spark, n, n // 2, n // 4, input_root=root,
                               use_bloom=True)
    r_exact = run_round_kernel(spark, n, n // 2, n // 4, input_root=root,
                               use_bloom=False)
    assert r_bloom == r_exact
    assert r_bloom["n_admitted"] > 0
    # the hot fingerprint group really is one n/4-row key
    texts = synth_texts_skewed(spark, n // 4)
    top = (
        texts.groupBy(F.xxhash64(F.lower(F.col("text")))).count()
        .agg(F.max("count")).first()[0]
    )
    assert top >= (n // 4) // 4
