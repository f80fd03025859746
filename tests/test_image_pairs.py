"""Crawl → image+caption pairs (the A+B graft integration, north_rule
"Iceberg tables of image + caption pairs"):

* the engine's ``image_captions`` delta (X4 alt extraction) equals the
  reference-semantics simulator's, like every other delta;
* assembling the crawl's captions with the payload store yields the
  input_hint table (image_id, bytes, w, h, fmt, caption, phash);
* every assembled row satisfies the per-row invariant: shape, phash
  recompute, decode round-trip (PSNR ≥ 40 dB lossy / exact lossless),
  and EXACT caption equality vs the ground truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.crawl.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.multimodal.pairs import (
    PAIR_SCHEMA,
    _image_id_col,
    assemble_pairs,
    distinct_caption_keys,
    ingest_payloads,
    verify_pairs,
)
from webcrawler_spark.sources.fixtures import SEED_URLS, image_id_of_src, make_webgraph
from webcrawler_spark.sources.simulator import simulate

N_HOSTS, BASE, ROUNDS = 6, 6, 40


@pytest.fixture(scope="module")
def fixture_graph():
    return make_webgraph(n_hosts=N_HOSTS, pages_per_host_base=BASE)


@pytest.fixture(scope="module")
def sim(fixture_graph):
    wg, robots = fixture_graph
    return simulate(wg, robots, list(SEED_URLS), max_rounds=ROUNDS)


@pytest.fixture(scope="module")
def engine(spark, fixture_graph, tmp_path_factory):
    wg, robots = fixture_graph
    root = str(tmp_path_factory.mktemp("pairs_store"))
    eng = CrawlEngine(
        spark,
        spark.createDataFrame(wg),
        spark.createDataFrame(robots),
        list(SEED_URLS),
        CrawlConfig(store_root=root, max_rounds=ROUNDS, checkpoint_every=10),
    )
    eng.run()
    return eng


def test_image_captions_delta_matches_simulator(engine, sim):
    got = sorted((r["page_url"], r["src"], r["alt"])
                 for r in engine.image_captions_df().collect())
    assert got == sorted(sim.image_captions)
    assert len(got) > 0
    # captions delta aligns 1:1 with the reference-parity images delta
    assert len(got) == engine.images_df().count()


def test_image_id_twin(engine, spark):
    """The Catalyst crc32 image_id equals the Python twin for every
    crawl-discovered src (the crawl→payload join key is portable)."""
    rows = (
        engine.image_captions_df().select("src")
        .distinct()
        .withColumn("image_id", _image_id_col(F.col("src")))
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r["image_id"] == image_id_of_src(r["src"])


def test_assembled_pairs_satisfy_input_hint_invariant(engine, spark):
    keys = distinct_caption_keys(engine.image_captions_df())
    n_keys = keys.count()
    assert n_keys > 0

    payloads = ingest_payloads(keys)
    pairs = assemble_pairs(keys, payloads)
    assert list(pairs.columns) == list(PAIR_SCHEMA)

    checked = verify_pairs(pairs).collect()
    # the join is lossless: one pair row per distinct src
    assert len(checked) == n_keys
    for r in checked:
        assert r["shape_ok"] and r["phash_ok"] and r["quality_ok"], r
        assert r["caption_ok"], r
        assert r["psnr_db"] >= 40.0 or r["psnr_db"] == float("inf")