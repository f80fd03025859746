"""robots.txt parsing (S4/F9), HTML→text (X13), XPath-lite (X10/X11),
mode-B extraction, wrapper induction (X15), A/V multimodal plumbing,
stateful streaming."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawler_spark.extract.html_text import (
    visible_text,
    xpath_all,
    xpath_string,
)
from webcrawler_spark.extract.induction import induce_template, induce_wrappers
from webcrawler_spark.extract.mode_b import XPathSiteConfig, extract_site_xpath
from webcrawler_spark.functions.robots import make_parse_robots_udf, parse_robots_py
from webcrawler_spark.multimodal.av import (
    audio_features,
    decode_audio,
    decode_video,
    sample_frames,
    synth_audio,
    synth_video,
)

ROBOTS = """# comment
User-agent: *
Disallow: /private
Allow: /private/pub
Crawl-delay: 10
Sitemap: http://h/sitemap.xml

User-agent: other
Disallow: /
"""


def test_parse_robots_py():
    r = parse_robots_py(ROBOTS)
    assert r.disallow == ["/private"]
    assert r.allow == ["/private/pub"]
    assert r.crawl_delay_s == 10
    assert r.sitemaps == ["http://h/sitemap.xml"]
    assert not r.is_html_page
    assert r.allows("/public")
    assert not r.allows("/private/x")
    assert r.allows("/private/pub/x")  # longest-match Allow wins


def test_parse_robots_html_rejected():
    # WebCrawler.java:108-112: robots serving an HTML page ⇒ treated absent
    r = parse_robots_py("<html><body>404</body></html>")
    assert r.is_html_page and r.allows("/private/x")


def test_parse_robots_udf(spark):
    df = spark.createDataFrame([(ROBOTS,), ("<html>err</html>",), (None,)], "body string")
    rows = df.select(make_parse_robots_udf()(F.col("body")).alias("r")).collect()
    assert rows[0]["r"]["disallow_prefixes"] == ["/private"]
    assert rows[0]["r"]["crawl_delay_s"] == 10
    assert rows[1]["r"]["is_html_page"] is True
    assert rows[2]["r"]["disallow_prefixes"] == []


HTML = (
    "<html><head><style>p{}</style><script>x=1</script></head>"
    "<body><nav>menu</nav><h1>Title A</h1>"
    "<div><span>Author X</span><time>2024</time></div>"
    "<div><a>t1</a><a>t2</a></div>"
    "<table><tr><td>r1c1</td><td>r1c2</td></tr><tr><td>r2c1</td></tr></table>"
    "<footer>foot</footer></body></html>"
)


def test_visible_text_kills_tags():
    t = visible_text(HTML)
    assert "Title A" in t and "Author X" in t
    assert "menu" not in t and "foot" not in t and "x=1" not in t and "p{}" not in t


def test_xpath_string_and_all():
    assert xpath_string(HTML, "/html/body/h1") == "Title A"
    assert xpath_string(HTML, "/html/body/div[1]/span") == "Author X"
    assert xpath_string(HTML, "/html/body/div[2]/a[2]") == "t2"
    assert xpath_all(HTML, "/html/body/div[2]/a") == ["t1", "t2"]
    # string() concatenates descendant text without separators, like lxml
    assert xpath_all(HTML, "/html/body/table/tr") == ["r1c1r1c2", "r2c1"]
    assert xpath_string(HTML, "/html/body/h2") == ""


def test_mode_b_extraction(spark):
    df = spark.createDataFrame([(1, HTML)], "id long, html string")
    cfg = XPathSiteConfig(
        name="news",
        fields={"Title": "/html/body/h1", "Author": "/html/body/div[1]/span"},
        repeated={"Tags": "/html/body/div[2]/a"},
    )
    out = extract_site_xpath(df, cfg).first()
    assert out["Title"] == "Title A"
    assert out["Author"] == "Author X"
    assert out["Tags"] == ["t1", "t2"]


P1 = "<html><body><h1>Product One</h1><span class='price'>$10</span><div id='x1234'>a</div></body></html>"
P2 = "<html><body><h1>Product Two</h1><span class='price'>$99</span><div id='x9999'>a</div><p>extra</p></body></html>"


def test_induce_template():
    tpl = induce_template(P1, P2)
    assert "#TEXT" in tpl                 # differing h1/span text → wildcard
    assert "( <p>extra</p> )?" in tpl     # page-2-only subtree → optional
    assert "<div>a</div>" in tpl          # id attr ignored (>3 digits)


def test_induce_repetition_collapse():
    a = "<ul><li>x</li><li>x</li><li>x</li></ul>"
    tpl = induce_template(f"<html><body>{a}</body></html>", f"<html><body>{a}</body></html>")
    assert "( <li>x</li> )+" in tpl


def test_induce_wrappers_grouped(spark):
    df = spark.createDataFrame(
        [("s1", P1), ("s1", P2), ("s2", P1)], "site string, html string"
    )
    rows = {r["site"]: r["template"] for r in induce_wrappers(df).collect()}
    assert "#TEXT" in rows["s1"]
    assert "Product One" in rows["s2"]  # single page → self-align, no wildcard


# ---------------------------------------------------------------------------
# A/V plumbing
# ---------------------------------------------------------------------------

def test_audio_roundtrip_and_features(spark):
    clips = [(f"c{i}", synth_audio(i)) for i in range(4)]
    samples, rate = decode_audio(clips[0][1])
    assert rate == 8000 and len(samples) == 8000
    df = spark.createDataFrame(clips, "clip_id string, bytes binary")
    rows = {r["clip_id"]: r for r in audio_features(df).collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert abs(r["duration_s"] - 1.0) < 1e-6
        assert 0.2 < r["rms"] < 0.3  # sine wave rms = (12000/32768)/√2 ≈ 0.259


def test_audio_real_codec_is_marked_stub():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03rest-of-an-mp3")


def test_video_frame_sampling(spark):
    vids = [(f"v{i}", synth_video(i)) for i in range(3)]
    frames, fps = decode_video(vids[0][1])
    assert frames.shape == (16, 24, 32) and fps == 8
    df = spark.createDataFrame(vids, "video_id string, bytes binary")
    out = sample_frames(df, every_n=4).collect()
    assert len(out) == 3 * 4  # 16 frames / every 4
    assert {r["frame_idx"] for r in out} == {0, 4, 8, 12}
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00 ftypmp42")


def test_stateful_streaming_counts(spark, tmp_path, sf_dir):
    from webcrawler_spark.streaming.stateful import stateful_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500).cache()
    p = str(tmp_path / "ev_state.parquet")
    ev.write.parquet(p)
    got = {r["host"]: (r["n"], r["total_value"]) for r in stateful_counts(spark, p).collect()}
    want = {
        r["event_type"]: (r["n"], r["tv"])
        for r in spark.read.parquet(p).groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("tv")).collect()
    }
    assert got == want


def test_parse_robots_consecutive_ua_groups():
    """Consecutive User-agent lines form one group (standard REP): rules
    after 'User-agent: *' + 'User-agent: googlebot' apply to BOTH; a new
    UA line after a rule line starts a fresh group."""
    from webcrawler_spark.functions.robots import parse_robots_py

    body = (
        "User-agent: *\nUser-agent: googlebot\nDisallow: /a\n"
        "User-agent: bingbot\nDisallow: /b\n"
    )
    r = parse_robots_py(body)  # default agent '*'
    assert r.disallow == ["/a"]
    rg = parse_robots_py(body, user_agent="googlebot")
    assert rg.disallow == ["/a"]
    # bingbot matches its own group AND the '*' group (this parser merges
    # all matching groups — the engine only ever asks for '*')
    rb = parse_robots_py(body, user_agent="bingbot")
    assert rb.disallow == ["/a", "/b"]
    # a rule line ends the UA run: the second group must not inherit '*'
    body2 = "User-agent: googlebot\nDisallow: /x\nUser-agent: other\nDisallow: /y\n"
    assert parse_robots_py(body2).disallow == []


def test_robots_allow_longest_match():
    """Longest-match Allow/Disallow with allow winning ties (F9)."""
    from webcrawler_spark.functions.robots import RobotsRules

    r = RobotsRules(disallow=["/private"], allow=["/private/open"])
    assert not r.allows("/private/x")
    assert r.allows("/private/open/p1")
    assert r.allows("/other")
    # tie: equal-length allow and disallow → allow wins
    t = RobotsRules(disallow=["/abc"], allow=["/abc"])
    assert t.allows("/abc/d")


def test_engine_honors_allow_carveout(spark, tmp_path_factory):
    """A /private/open page admitted by the Allow rule is crawled by BOTH
    engine and simulator; plain /private stays blocked. Built on a
    hand-rolled webgraph so the carve-out is guaranteed present."""
    import pandas as pd

    from webcrawler_spark.crawl.engine import CrawlConfig, CrawlEngine
    from webcrawler_spark.sources.simulator import simulate

    wg = pd.DataFrame([
        {"url": "http://gov.si", "host": "gov.si", "ip": "10.0.0.1",
         "content_type": "text/html", "status": 200, "text_norm": "root page",
         "html": '<a href="http://gov.si/private/open/p1"><a href="http://gov.si/private/p2">'
                 '<a href="http://gov.si/p3">',
         "img_srcs": [], "out_links": ["http://gov.si/private/open/p1",
                                       "http://gov.si/private/p2", "http://gov.si/p3"],
         "redirect_to": None},
        {"url": "http://gov.si/private/open/p1", "host": "gov.si", "ip": "10.0.0.1",
         "content_type": "text/html", "status": 200, "text_norm": "open page",
         "html": "", "img_srcs": [], "out_links": [], "redirect_to": None},
        {"url": "http://gov.si/private/p2", "host": "gov.si", "ip": "10.0.0.1",
         "content_type": "text/html", "status": 200, "text_norm": "blocked page",
         "html": "", "img_srcs": [], "out_links": [], "redirect_to": None},
        {"url": "http://gov.si/p3", "host": "gov.si", "ip": "10.0.0.1",
         "content_type": "text/html", "status": 200, "text_norm": "plain page",
         "html": "", "img_srcs": [], "out_links": [], "redirect_to": None},
    ])
    robots = pd.DataFrame([
        {"host": "gov.si",
         "body": "User-agent: *\nDisallow: /private\nAllow: /private/open\n",
         "disallow_prefixes": ["/private"], "allow_prefixes": ["/private/open"],
         "crawl_delay_s": 0, "sitemaps": [], "is_html_page": False},
    ])
    sim = simulate(wg, robots, ["http://gov.si"], max_rounds=40)
    root = str(tmp_path_factory.mktemp("allow_crawl"))
    eng = CrawlEngine(
        spark, spark.createDataFrame(wg), spark.createDataFrame(robots),
        ["http://gov.si"],
        CrawlConfig(store_root=root, max_rounds=40, checkpoint_every=5,
                    collect_metrics=False),
    )
    eng.run()
    eseen = {r["url"] for r in eng.seen_df().collect()}
    assert eseen == sim.seen
    assert "http://gov.si/private/open/p1" in eseen
    assert "http://gov.si/private/p2" not in eseen
