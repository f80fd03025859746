"""TTL re-crawl eviction (CrawlEngine.evict_seen) — the capability the
cuckoo seen-set layout exists for (functions/cuckoo.py header).

The oracle is config-invariance: the exact ``seen`` state is the source
of truth, so the SAME crawl + eviction schedule must produce IDENTICAL
traces and final seen sets with (a) no prefilter, (b) the sharded Bloom
sidecar (bits cannot be unset — evicted URLs stay as stale superset
entries absorbed by the exact confirm join), and (c) the sharded cuckoo
sidecar (fingerprints removed via delete_guarded). Each run also crosses
a resume boundary between the eviction and the continuation, proving the
evictions delta + stamp-aware ``_load_state`` reconstruction.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.crawl.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.functions.bloom import anti_join_with_bloom
from webcrawler_spark.functions.cuckoo import build_sharded_cuckoo
from webcrawler_spark.sources.fixtures import SEED_URLS, make_webgraph


def test_cuckoo_delete_guarded_prefilter_stays_exact(spark):
    """Operator level: after a guarded eviction, the prefiltered
    anti-join vs the SURVIVING seen set equals the plain anti-join
    (no false negatives for survivors, whatever got blocked/evicted),
    and the filter actually tightened (some evicted URLs probe false)."""
    cand = spark.range(20_000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".gov.si/p"), F.col("id").cast("string")).alias("url"),
        F.col("id").alias("meta"),
    )
    seen = spark.range(0, 20_000, 3).select(
        F.concat(F.lit("http://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".gov.si/p"), F.col("id").cast("string")).alias("url")
    )
    sidecar = build_sharded_cuckoo(seen, "url", n_shards=7)
    try:
        evict = seen.filter(F.xxhash64("url") % 4 == 0).persist()
        surviving = seen.join(evict, "url", "left_anti").persist()
        n_evict = evict.count()
        removed = sidecar.delete_guarded(evict, surviving, "url")
        assert 0 < removed <= n_evict
        # survivors: no false negatives through the post-delete filter
        assert surviving.filter(~sidecar.probe(F.col("url"))).count() == 0
        # the prefiltered anti-join vs surviving seen is still EXACT
        plain = {tuple(r) for r in
                 cand.join(surviving, "url", "left_anti").collect()}
        filtered = {tuple(r) for r in
                    anti_join_with_bloom(cand, surviving, "url",
                                         sidecar).collect()}
        assert filtered == plain
        # and the eviction actually tightened the filter: most evicted
        # URLs now probe false (aliased/blocked ones may remain true)
        still_true = evict.filter(sidecar.probe(F.col("url"))).count()
        assert still_true < n_evict
    finally:
        evict.unpersist()
        surviving.unpersist()
        sidecar.destroy()


def _crawl_with_eviction(spark, wg_df, robots_df, root, prefilter, layout):
    """Phase 1 (6 rounds) → evict every URL picked so far → resume a NEW
    engine → run to completion. Returns (evicted, trace, seen, frontier)."""
    base = dict(store_root=root, checkpoint_every=3, collect_metrics=False,
                use_bloom_prefilter=prefilter, seen_filter=layout)
    eng1 = CrawlEngine(
        spark, wg_df, robots_df, list(SEED_URLS),
        CrawlConfig(max_rounds=6, **base),
    )
    eng1.run()
    evict = sorted({r["url"] for r in eng1.trace_df().collect()})
    n = eng1.evict_seen(
        spark.createDataFrame([(u,) for u in evict], "url string"))
    assert n == len(evict)  # all picked URLs are seen and not queued
    # compact the store at the boundary: the eviction-aware reconstruction
    # counts admission/pick MULTIPLICITY per url, so this also proves the
    # delta merge preserves row multisets, not just row sets
    from webcrawler_spark.storage.compaction import compact_crawl_store
    compact_crawl_store(spark, root)
    # cross a resume boundary: the eviction must be durable in the store
    eng2 = CrawlEngine(
        spark, wg_df, robots_df, list(SEED_URLS),
        CrawlConfig(max_rounds=120, **base),
        resume=True,
    )
    eng2.run()
    trace = sorted((r["time_ms"], r["url"])
                   for r in eng2.trace_df().collect())
    seen = {r["url"] for r in eng2.seen_df().collect()}
    frontier = {r["url"] for r in eng2.frontier.collect()}
    visit_counts = collections.Counter(
        r["url"] for r in eng2._read_all("page_visits").collect())
    return set(evict), trace, seen, frontier, visit_counts


@pytest.mark.slow
def test_eviction_recrawl_invariant_across_seen_filters(spark, tmp_path_factory):
    wg, robots = make_webgraph(n_hosts=5, pages_per_host_base=6)
    wg_df, robots_df = spark.createDataFrame(wg), spark.createDataFrame(robots)
    results = {}
    for name, prefilter, layout in (
        ("exact", False, "bloom"),
        ("bloom", True, "bloom"),
        ("cuckoo", True, "cuckoo"),
    ):
        root = str(tmp_path_factory.mktemp(f"evict_{name}"))
        results[name] = _crawl_with_eviction(
            spark, wg_df, robots_df, root, prefilter, layout)

    evicted, trace, seen, frontier, visit_counts = results["exact"]
    # config-invariance: all three seen-filter configs crawl identically
    assert results["bloom"] == results["exact"]
    assert results["cuckoo"] == results["exact"]

    # the eviction DID cause re-crawls: some evicted URL was re-linked by
    # a later page and fetched a second time — and ONLY evicted URLs are
    # ever fetched twice (dedup still exact for everything else)
    counts = collections.Counter(u for _, u in trace)
    refetched = {u for u, c in counts.items() if c > 1}
    assert len(refetched) >= 1
    assert refetched <= evicted
    assert max(counts.values()) == 2
    # re-fetched URLs are seen again; evicted-never-relinked URLs are
    # neither seen nor queued at the end
    assert refetched <= seen
    gone_forever = evicted - refetched
    assert not (gone_forever & seen) and not (gone_forever & frontier)
    # and the re-fetch STORED a fresh page version: a second visit row
    # exists (the versioned-store re-crawl semantics — not merely a
    # consumed-without-storing pick)
    for u in refetched:
        assert visit_counts[u] >= 2, u


@pytest.mark.slow
def test_eviction_midphase_resume_requeues_readmitted(spark, tmp_path_factory):
    """Interrupt the post-eviction crawl EARLY and resume again: a
    re-admitted URL sitting in the frontier at the second interruption
    must be re-queued by the count-aware reconstruction (admissions
    outnumber picks), and the final crawl must equal the uninterrupted
    eviction run's."""
    wg, robots = make_webgraph(n_hosts=5, pages_per_host_base=6)
    wg_df, robots_df = spark.createDataFrame(wg), spark.createDataFrame(robots)

    root_a = str(tmp_path_factory.mktemp("evict_onego"))
    expected = _crawl_with_eviction(
        spark, wg_df, robots_df, root_a, False, "bloom")

    root = str(tmp_path_factory.mktemp("evict_chopped"))
    base = dict(store_root=root, checkpoint_every=2, collect_metrics=False,
                use_bloom_prefilter=False)
    eng1 = CrawlEngine(spark, wg_df, robots_df, list(SEED_URLS),
                       CrawlConfig(max_rounds=6, **base))
    eng1.run()
    evict = sorted({r["url"] for r in eng1.trace_df().collect()})
    eng1.evict_seen(
        spark.createDataFrame([(u,) for u in evict], "url string"))
    # resume, run only a few rounds past the eviction, "crash", resume again
    eng2 = CrawlEngine(spark, wg_df, robots_df, list(SEED_URLS),
                       CrawlConfig(max_rounds=10, **base), resume=True)
    eng2.run()
    eng3 = CrawlEngine(spark, wg_df, robots_df, list(SEED_URLS),
                       CrawlConfig(max_rounds=120, **base), resume=True)
    eng3.run()
    trace = sorted((r["time_ms"], r["url"])
                   for r in eng3.trace_df().collect())
    seen = {r["url"] for r in eng3.seen_df().collect()}
    frontier = {r["url"] for r in eng3.frontier.collect()}
    visit_counts = collections.Counter(
        r["url"] for r in eng3._read_all("page_visits").collect())
    assert (set(evict), trace, seen, frontier, visit_counts) == expected
