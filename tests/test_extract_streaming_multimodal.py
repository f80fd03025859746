"""Mode-A extraction registry (X6-X12), link/image mining (X3/X4),
streaming-analog windowed aggs + sessionization, multimodal plumbing."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.extract.links import all_candidate_links, href_links, img_srcs, onclick_links
from webcrawler_spark.extract.mode_a import DEFAULT_SITES, SiteConfig, extract_site
from webcrawler_spark.multimodal import grid_features, resize_images, verify_invariants
from webcrawler_spark.sources.fixtures import make_images, render_image
from webcrawler_spark.streaming.events import sessionize, tumbling_counts


NEWS_HTML = (
    "<html><body><h1> Headline </h1><h2>Sub</h2>"
    '<p class="lead">Lead\ntext</p><span class="author">A. Writer</span>'
    "<time>2024-01-01</time>"
    '<a class="tag">tag1</a><a class="tag"> tag2 </a></body></html>'
)
SHOP_HTML = (
    '<b class="title">Ring</b><s>$170.00</s><span class="price">$79.01</span>'
    '<span class="saving">$90.99 (53%)</span><p class="desc">Nice ring</p>'
)


def test_extract_news(spark):
    df = spark.createDataFrame([(1, NEWS_HTML)], "id long, html string")
    out = extract_site(df, DEFAULT_SITES[0]).first()
    assert out["Title"] == "Headline"
    assert out["SubTitle"] == "Sub"
    assert out["Lead"] == "Leadtext"          # X7 newline scrub before match
    assert out["Author"] == "A. Writer"       # X6 trim
    assert out["PublishedTime"] == "2024-01-01"
    assert out["Tags"] == ["tag1", "tag2"]    # X9 repeated group, trimmed


def test_extract_shop_savings_split(spark):
    df = spark.createDataFrame([(1, SHOP_HTML)], "id long, html string")
    out = extract_site(df, DEFAULT_SITES[1]).first()
    assert out["Title"] == "Ring"
    assert out["ListPrice"] == "$170.00"
    assert out["Price"] == "$79.01"
    # X12: "$90.99 (53%)".split(" ") — percent keeps its parens
    assert out["Saving"] == "$90.99"
    assert out["SavingPercent"] == "(53%)"
    assert out["Content"] == "Nice ring"


def test_extract_missing_fields_default_empty(spark):
    df = spark.createDataFrame([(1, "<html></html>")], "id long, html string")
    out = extract_site(df, DEFAULT_SITES[0]).first()
    assert out["Title"] == "" and out["Tags"] == []


def test_link_mining(spark):
    html = (
        '<a href="http://a/1">x</a><a class="z" href="/rel">y</a>'
        "<button onclick=\"location.href='http://a/2'\">go</button>"
        '<img src="http://a/i.png"/><img src="data:image/png;base64,xx"/>'
    )
    df = spark.createDataFrame([(html,)], "html string")
    r = df.select(
        href_links(F.col("html")).alias("h"),
        onclick_links(F.col("html")).alias("o"),
        all_candidate_links(F.col("html")).alias("a"),
        img_srcs(F.col("html")).alias("i"),
    ).first()
    assert r["h"] == ["http://a/1", "/rel"]
    assert r["o"] == ["http://a/2"]
    assert r["a"] == ["http://a/1", "/rel", "http://a/2"]
    assert r["i"] == ["http://a/i.png", "data:image/png;base64,xx"]


# --------------------------------------------------------------------------
# streaming-analog
# --------------------------------------------------------------------------

def _events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=m), 10, "click", 1.0, "{}")
        for m in (0, 10, 20, 70, 200)
    ] + [(2, base + dt.timedelta(minutes=5), 11, "view", 2.0, "{}")]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_tumbling_counts(spark):
    out = tumbling_counts(_events(spark), minutes=60).collect()
    got = {(r["window_start"].minute + r["window_start"].hour * 60, r["event_type"]): r["n"] for r in out}
    assert got == {(0, "click"): 3, (0, "view"): 1, (60, "click"): 1, (180, "click"): 1}


def test_sessionize(spark):
    out = sessionize(_events(spark), gap_minutes=30).collect()
    u10 = [(r["session_no"], r["n_events"]) for r in out if r["user_id"] == 10]
    # gaps: 10,10 (in), 50 (break), 130 (break) → sessions of 3, 1, 1
    assert u10 == [(1, 3), (2, 1), (3, 1)]


def test_streaming_matches_batch(spark, tmp_path):
    from webcrawler_spark.streaming.events import streaming_tumbling_counts

    ev = _events(spark)
    p = str(tmp_path / "ev.parquet")
    ev.write.parquet(p)
    batch = tumbling_counts(ev, minutes=60).collect()
    stream = streaming_tumbling_counts(spark, p, minutes=60).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def images_df(spark):
    df = spark.createDataFrame(make_images(12)).cache()
    df.count()
    return df


def test_verify_invariants_all_pass(images_df):
    out = verify_invariants(images_df).collect()
    assert len(out) == 12
    for r in out:
        assert r["shape_ok"] and r["phash_ok"] and r["quality_ok"], r


def test_resize_images(images_df):
    out = resize_images(images_df, target=16).collect()
    from webcrawler_spark.functions.images import decode_image

    for r in out:
        assert decode_image(bytes(r["bytes"])).shape == (16, 16, 3)


def test_grid_features(images_df):
    out = grid_features(images_df, grid=4).collect()
    for r in out:
        assert len(r["features"]) == 48  # 4×4 cells × RGB
        assert all(0.0 <= x <= 1.0 for x in r["features"])


def test_caption_equality(images_df):
    # caption ground truth re-rendered from image_id (input_hint equality)
    for r in images_df.select("image_id", "caption").collect():
        assert render_image(r["image_id"])[4] == r["caption"]


def test_stream_image_invariants_matches_batch(spark, tmp_path):
    """The image invariant gate as a structured stream (file feed →
    mapInPandas → parquet sink): two availableNow passes over staggered
    file drops produce exactly the batch result, each pass verifying only
    the newly landed files."""
    from webcrawler_spark.streaming.images import stream_image_invariants

    pdf = make_images(24)
    feed = tmp_path / "imgfeed"
    feed.mkdir()
    pdf.iloc[:16].to_parquet(str(feed / "drop_0.parquet"), index=False)

    out_dir, ckpt = str(tmp_path / "inv_out"), str(tmp_path / "inv_ckpt")
    stream_image_invariants(spark, str(feed), out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 16

    pdf.iloc[16:].to_parquet(str(feed / "drop_1.parquet"), index=False)
    stream_image_invariants(spark, str(feed), out_dir, ckpt)

    batch = sorted(
        map(tuple, verify_invariants(spark.createDataFrame(pdf)).collect()))
    stream = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert stream == batch
    assert all(r[1] and r[2] and r[3] for r in stream)  # invariants hold
