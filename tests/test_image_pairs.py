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


def test_stream_pair_assembly_matches_batch(engine, spark, tmp_path):
    """Pair assembly as a structured stream over the crawl's own
    image_captions deltas: draining the delta feed in two staggered
    passes (with a restart between them) yields exactly the batch
    assembly, and a replayed pass pairs nothing twice."""
    import os
    import shutil

    from webcrawler_spark.streaming.pairs import stream_pair_assembly

    caps = engine.image_captions_df()
    keys = distinct_caption_keys(caps)
    payload_dir = str(tmp_path / "payloads")
    ingest_payloads(keys).write.parquet(payload_dir)
    payloads = spark.read.parquet(payload_dir)

    def rows(df):
        return sorted(
            (r["image_id"], bytes(r["bytes"]), r["w"], r["h"], r["fmt"],
             r["caption"], r["phash"])
            for r in df.collect())

    want = rows(assemble_pairs(keys, payloads))

    # stagger the crawl's committed caption files into a feed dir in two
    # drops — simulating rounds landing. File-granular splits can carry
    # the SAME src in both drops, which exercises the carried
    # first-arrival state (the batch twin still matches because the
    # fixture's alt is a pure function of src).
    src_files = sorted(
        os.path.join(r, f_)
        for r, _d, fs in os.walk(f"{engine.store.root}/image_captions")
        for f_ in fs if f_.endswith(".parquet"))
    assert len(src_files) >= 2
    feed = tmp_path / "feed"
    feed.mkdir()

    def drop(paths, mtime):
        for i, p in enumerate(paths):
            dst = str(feed / f"{int(mtime)}_{i}.parquet")
            shutil.copyfile(p, dst)
            os.utime(dst, (mtime, mtime))

    out_dir, ckpt, state = (str(tmp_path / "pairs_out"),
                            str(tmp_path / "ckpt"), str(tmp_path / "state"))
    drop(src_files[:-1], 1_000_000_000)
    n1 = stream_pair_assembly(
        spark, str(feed), payloads, out_dir, ckpt, state)
    assert n1 >= 1
    drop(src_files[-1:], 1_000_000_100)
    n2 = stream_pair_assembly(
        spark, str(feed), payloads, out_dir, ckpt, state)
    assert n2 >= 1
    assert rows(spark.read.parquet(out_dir)) == want
    # idle pass: nothing new, nothing re-paired
    assert stream_pair_assembly(
        spark, str(feed), payloads, out_dir, ckpt, state) == 0
    assert rows(spark.read.parquet(out_dir)) == want


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

def test_composed_funnel_over_real_crawl_pairs(engine, spark):
    """The composed pair funnel (multimodal/funnel.py) over the BYTES-REAL
    pair table a real crawl assembled — stage flags must be consistent
    with direct recomputation from the pair rows themselves, selection
    must be non-vacuous, and the batch plan must be dense per batch."""
    from webcrawler_spark.multimodal.funnel import pair_funnel

    keys = distinct_caption_keys(engine.image_captions_df())
    pairs = assemble_pairs(keys, ingest_payloads(keys))
    rows = {r.image_id: r for r in pairs.collect()}
    out = pair_funnel(pairs).collect()
    assert len(out) == len(rows)

    n_sel = sum(r.selected for r in out)
    assert 0 < n_sel <= len(out)
    for r in out:
        src = rows[r.image_id]
        # gate flags recompute from the raw pair row
        ntok = len([t for t in __import__("re").split(
            r"[^a-z0-9]+", (src.caption or "").lower()) if t])
        assert r.caption_ok == (src.caption is not None and ntok >= 2)
        assert r.gate_ok == (r.caption_ok and src.w * src.h >= 4096)
        if r.selected:
            assert r.aligned and r.neardup_keep and r.batch_id is not None
        else:
            assert r.is_full is False
    # batch plan: dense slots, exact is_full
    by_batch = {}
    for r in out:
        if r.selected:
            by_batch.setdefault((r.bucket_id, r.shard, r.batch_id), []).append(r)
    for rows_b in by_batch.values():
        assert sorted(r.slot for r in rows_b) == list(range(len(rows_b)))
        assert all(r.is_full == (len(rows_b) == 8) for r in rows_b)


def test_crawl_to_training_shards_end_to_end(spark, engine, tmp_path):
    """CAPSTONE: crawl store → pair assembly → composed curation funnel →
    WebDataset tar shards → read-back. Exactly the funnel's selected
    pairs land in the shards; their bytes and captions are byte-exact
    against the assembled pair table."""
    from pyspark.sql import functions as F

    from webcrawler_spark.multimodal.funnel import pair_funnel
    from webcrawler_spark.multimodal.webdataset import (
        plan_wds_shards,
        read_webdataset,
        write_webdataset,
    )

    keys = distinct_caption_keys(engine.image_captions_df())
    pairs = assemble_pairs(keys, ingest_payloads(keys)).persist()
    fun = pair_funnel(pairs)
    selected = {r.image_id for r in fun.collect() if r.selected}
    assert selected  # the fixture crawl yields gated survivors
    surv = pairs.join(
        fun.filter("selected").select("image_id"), "image_id", "inner"
    )
    # order-aligned bucket: numeric tail of the zero-padded crc32 key
    bkt = (F.substring("image_id", 4, 10).cast("long") / F.lit(1 << 20)).cast(
        "long"
    )
    out = str(tmp_path / "wds")
    write_webdataset(
        plan_wds_shards(surv, budget_bytes=256 * 1024, bucket=bkt), out
    ).collect()
    back = {r["key"]: r for r in read_webdataset(spark, out + "/*.tar").collect()}
    assert set(back) == selected
    src = {r["image_id"]: r for r in surv.collect()}
    for k, b in back.items():
        assert bytes(b["bytes"]) == bytes(src[k]["bytes"])
        assert b["caption"] == src[k]["caption"]
        assert b["fmt"] == src[k]["fmt"]
    pairs.unpersist()
