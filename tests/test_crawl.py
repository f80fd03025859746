"""End-to-end crawl engine vs the reference-semantics simulator (SURVEY.md
§5 test 3): visited-set equality, page-type equality, per-host visit-order
equality, link/image-row equality — plus checkpoint/resume equivalence
(north_rule) and politeness/containment property checks.

The simulator (webcrawler_spark.sources.simulator) is an independently
written single-threaded restatement of WebCrawler.java:152-202/391-414 on
a logical clock; no code is shared with the engine except the pure
canonicalization helpers.
"""

from __future__ import annotations

import shutil

import pytest

from webcrawler_spark.crawl.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.sources.fixtures import SEED_URLS, make_webgraph
from webcrawler_spark.sources.simulator import simulate

N_HOSTS, BASE = 8, 8


@pytest.fixture(scope="module")
def fixture_graph():
    wg, robots = make_webgraph(n_hosts=N_HOSTS, pages_per_host_base=BASE)
    return wg, robots


@pytest.fixture(scope="module")
def sim(fixture_graph):
    wg, robots = fixture_graph
    return simulate(wg, robots, list(SEED_URLS), max_rounds=300)


@pytest.fixture(scope="module")
def engine(spark, fixture_graph, tmp_path_factory):
    wg, robots = fixture_graph
    root = str(tmp_path_factory.mktemp("crawl_store"))
    eng = CrawlEngine(
        spark,
        spark.createDataFrame(wg),
        spark.createDataFrame(robots),
        list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=300, checkpoint_every=5,
                    collect_metrics=True),
    )
    eng.run()
    return eng


def test_trace_set_and_order(engine, sim):
    etrace = [(r["time_ms"], r["seq"], r["url"], r["host"]) for r in engine.trace_df().collect()]
    strace = list(sim.trace)
    assert {(t, u) for (t, s, u, h) in etrace} == {(t, u) for (t, s, u, h) in strace}
    # per-host visit order (the crawl-ordering gate: FIFO-with-skip serialization)
    from collections import defaultdict

    eo, so = defaultdict(list), defaultdict(list)
    for t, s, u, h in sorted(etrace):
        eo[h].append(u)
    for t, s, u, h in sorted(strace):
        so[h].append(u)
    assert dict(eo) == dict(so)


def test_seen_set_equal(engine, sim):
    eseen = {r["url"] for r in engine.seen_df().collect()}
    assert eseen == sim.seen


def test_pages_equal(engine, sim):
    epages = {r["url"]: r["page_type_code"] for r in engine.pages_df().collect()}
    spages = {u: v["page_type_code"] for u, v in sim.pages.items()}
    assert epages == spages


def test_links_and_images_equal(engine, sim):
    elinks = {(r["from_url"], r["to_url"]) for r in engine.links_df().collect()}
    assert elinks == set(sim.links)
    eimgs = sorted((r["page_url"], r["src"], r["content_type"]) for r in engine.images_df().collect())
    assert eimgs == sorted(sim.images)


def test_page_data_rows_equal(engine, sim):
    """Every BINARY page carries exactly one page_data row whose X1-coded
    data_type_code (null on switch fall-through) matches the simulator
    (DatabaseHandler.java:177-178, WebCrawler.java:369-371)."""
    pd_df = engine.page_data_df()
    assert pd_df is not None
    erows = sorted((r["url"], r["data_type_code"]) for r in pd_df.collect())
    assert erows == sorted(sim.page_data)
    assert len(erows) > 0  # the fixture webgraph reaches BINARY pages
    binaries = {u for u, v in sim.pages.items() if v["page_type_code"] == "BINARY"}
    assert {u for u, _ in erows} == binaries


def test_site_rows_equal(engine, sim, fixture_graph):
    """One site row per first-dequeued domain — (domain, robots_content,
    sitemap_content) with sitemap_content = Arrays.toString(sitemaps) on a
    live robots fetch, nulls when robots is missing or an HTML page
    (DatabaseHandler.java:21-47, WebCrawler.java:77-124)."""
    st = engine.sites_df()
    assert st is not None
    erows = {r["domain"]: (r["robots_content"], r["sitemap_content"])
             for r in st.collect()}
    assert st.count() == len(erows)  # exactly one row per domain
    assert erows == sim.sites
    assert len(erows) > 0
    # at least one live-robots domain carries content in the fixture, and
    # its sitemap string is the Arrays.toString of the fixture's list
    _, robots = fixture_graph
    live = {r["host"] for _, r in robots.iterrows() if not r["is_html_page"]}
    with_content = {d for d, (rc, sc) in erows.items() if rc is not None}
    assert with_content == set(erows) & live
    for d in with_content:
        assert erows[d][1] == f"[http://{d}/sitemap.xml]"


def test_politeness_invariant(engine, fixture_graph):
    """No host visited twice within its crawl delay on the logical clock."""
    _, robots = fixture_graph
    delays = {
        r["host"]: (int(r["crawl_delay_s"]) * 1000 if int(r["crawl_delay_s"]) > 0 else 5000)
        for _, r in robots.iterrows()
        if not r["is_html_page"]
    }
    per_host: dict[str, list[int]] = {}
    for r in engine.trace_df().collect():
        per_host.setdefault(r["host"], []).append(r["time_ms"])
    for host, times in per_host.items():
        d = delays.get(host, 5000)
        times.sort()
        for a, b in zip(times, times[1:]):
            assert b - a >= d, (host, a, b, d)


def test_containment_invariant(engine):
    for r in engine.pages_df().select("url").collect():
        host = r["url"].split("://", 1)[-1].split("/", 1)[0]
        assert host == "gov.si" or host.endswith(".gov.si"), r["url"]


def test_metrics_lineage_present(engine):
    m = engine.metrics_df()
    assert m is not None
    tables = {r["table"] for r in m.select("table").distinct().collect()}
    assert {"trace", "page_visits", "page_admissions"} <= tables
    assert m.filter("rows < 0").count() == 0


def test_resume_equivalence(spark, fixture_graph, sim, tmp_path_factory):
    """Kill after k rounds, resume from the store, final state identical
    (north_rule: resumable from checkpoint)."""
    wg, robots = fixture_graph
    root = str(tmp_path_factory.mktemp("crawl_resume"))
    wg_df = spark.createDataFrame(wg)
    robots_df = spark.createDataFrame(robots)
    # phase 1: run only 6 rounds, commit every 2 (simulates a crash at r6)
    e1 = CrawlEngine(
        spark, wg_df, robots_df, list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=6, checkpoint_every=2,
                    collect_metrics=False),
    )
    e1.run()
    # phase 2: resume from the committed snapshot and finish
    e2 = CrawlEngine(
        spark, wg_df, robots_df, list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=300, checkpoint_every=5,
                    collect_metrics=False),
        resume=True,
    )
    assert e2._start_round == 6
    e2.run()
    epages = {r["url"]: r["page_type_code"] for r in e2.pages_df().collect()}
    spages = {u: v["page_type_code"] for u, v in sim.pages.items()}
    assert epages == spages
    eseen = {r["url"] for r in e2.seen_df().collect()}
    assert eseen == sim.seen
    # a resumed run must also reproduce the simulator's TRACE — (tick, url)
    # set and per-host pick order. This is what catches a resume-derived
    # frontier dropping admitted-but-unpicked URLs (they would be missing
    # picks here even when pages/seen still converge).
    etrace = [(r["time_ms"], r["url"], r["host"]) for r in e2.trace_df().collect()]
    assert {(t, u) for (t, u, h) in etrace} == {(t, u) for (t, s, u, h) in sim.trace}
    from collections import defaultdict

    eo, so = defaultdict(list), defaultdict(list)
    for t, u, h in sorted(etrace):
        eo[h].append(u)
    for t, s, u, h in sim.trace:
        so[h].append(u)
    assert eo == so
    # site rows survive the resume with no duplicate per-domain inserts
    # (the resume rebuilds the emitted-domain guard from the committed
    # table, like the reference's getSiteId != -1 check)
    st = e2.sites_df()
    assert st is not None and st.count() == len(sim.sites)
    esites = {r["domain"]: (r["robots_content"], r["sitemap_content"])
              for r in st.collect()}
    assert esites == sim.sites


def test_resume_after_store_compaction(spark, fixture_graph, sim, tmp_path_factory):
    """Kill after k rounds, COMPACT the store's delta dirs
    (storage/compaction.py), resume — final pages/seen/trace/sites still
    equal the simulator: every resume reconstruction is a pure function
    of delta rows, which the merge preserves exactly."""
    from webcrawler_spark.storage.compaction import compact_crawl_store

    wg, robots = fixture_graph
    root = str(tmp_path_factory.mktemp("crawl_compact"))
    wg_df = spark.createDataFrame(wg)
    robots_df = spark.createDataFrame(robots)
    e1 = CrawlEngine(
        spark, wg_df, robots_df, list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=6, checkpoint_every=2,
                    collect_metrics=False),
    )
    e1.run()
    stats = compact_crawl_store(spark, root)
    assert stats, "multi-round commit must leave something to compact"
    import glob as _g
    for t in stats:  # exactly one committed delta dir remains per table
        assert len(_g.glob(f"{root}/{t}/delta_r*")) == 1
    e2 = CrawlEngine(
        spark, wg_df, robots_df, list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=300, checkpoint_every=5,
                    collect_metrics=False),
        resume=True,
    )
    assert e2._start_round == 6
    e2.run()
    epages = {r["url"]: r["page_type_code"] for r in e2.pages_df().collect()}
    assert epages == {u: v["page_type_code"] for u, v in sim.pages.items()}
    assert {r["url"] for r in e2.seen_df().collect()} == sim.seen
    etrace = {(r["time_ms"], r["url"]) for r in e2.trace_df().collect()}
    assert etrace == {(t, u) for (t, s, u, h) in sim.trace}
    esites = {r["domain"]: (r["robots_content"], r["sitemap_content"])
              for r in e2.sites_df().collect()}
    assert esites == sim.sites
