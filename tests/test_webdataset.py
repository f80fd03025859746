"""WebDataset tar shard export: exact size model, deterministic bytes,
byte-exact round trip over the WCIM-encoded fixture images."""

from __future__ import annotations

import hashlib
import io
import tarfile

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.multimodal.webdataset import (
    BLOCK,
    RECORD,
    plan_wds_shards,
    read_webdataset,
    write_webdataset,
)
from webcrawler_spark.sources.fixtures import make_images


def _pad(n: int) -> int:
    return -(-n // BLOCK) * BLOCK


def _entry(img: bytes, cap: str) -> int:
    return 2 * BLOCK + _pad(len(img)) + _pad(len(cap.encode("utf-8")))


@pytest.fixture(scope="module")
def pairs_pdf():
    pdf = make_images(48)
    # exercise the UTF-8 path: captions with multi-byte characters
    pdf.loc[pdf.index[::7], "caption"] = pdf["caption"][::7] + " — čaj š"
    return pdf


@pytest.fixture(scope="module")
def planned(spark, pairs_pdf):
    pairs = spark.createDataFrame(pairs_pdf)
    # order-aligned bucket: the numeric tail of imgNNNNNNNNNN
    bkt = (F.substring("image_id", 4, 10).cast("long") / 16).cast("long")
    return plan_wds_shards(pairs, budget_bytes=64 * 1024, bucket=bkt).persist()


def test_plan_matches_exclusive_prefix_rule(planned, pairs_pdf):
    rows = {
        r["image_id"]: r
        for r in planned.select("image_id", "entry_bytes", "shard_id").collect()
    }
    prefix = 0
    for _, p in pairs_pdf.sort_values("image_id").iterrows():
        want_entry = _entry(p["bytes"], p["caption"])
        got = rows[p["image_id"]]
        assert got["entry_bytes"] == want_entry
        assert got["shard_id"] == prefix // (64 * 1024)
        prefix += want_entry


def test_write_manifest_sizes_exact(planned, tmp_path):
    man = write_webdataset(planned, str(tmp_path / "wds")).collect()
    plan = (
        planned.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("entry_bytes").alias("content"),
            F.sum(
                F.octet_length("bytes") + F.octet_length("caption")
            ).alias("payload"),
        )
        .collect()
    )
    want = {r["shard_id"]: r for r in plan}
    assert len(man) == len(want) > 1
    for m in man:
        w = want[m["shard_id"]]
        assert m["n_samples"] == w["n"]
        assert m["payload_bytes"] == w["payload"]
        # the size model predicts the real on-disk tar to the byte
        content = w["content"] + 2 * BLOCK
        assert m["tar_bytes"] == -(-content // RECORD) * RECORD


def test_write_is_deterministic(planned, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    p1 = {r["shard_id"]: r["path"] for r in write_webdataset(planned, d1).collect()}
    p2 = {r["shard_id"]: r["path"] for r in write_webdataset(planned, d2).collect()}
    assert p1.keys() == p2.keys()
    for sid in p1:
        h1 = hashlib.sha256(open(p1[sid], "rb").read()).hexdigest()
        h2 = hashlib.sha256(open(p2[sid], "rb").read()).hexdigest()
        assert h1 == h2


def test_round_trip_byte_exact(spark, planned, pairs_pdf, tmp_path):
    out = str(tmp_path / "wds")
    write_webdataset(planned, out).collect()
    back = {
        r["key"]: r
        for r in read_webdataset(spark, out + "/*.tar").collect()
    }
    assert len(back) == len(pairs_pdf)
    for _, p in pairs_pdf.iterrows():
        b = back[p["image_id"]]
        assert bytes(b["bytes"]) == bytes(p["bytes"])
        assert b["caption"] == p["caption"]
        assert b["fmt"] == p["fmt"]


def test_tar_members_are_ustar_and_key_ordered(planned, tmp_path):
    man = write_webdataset(planned, str(tmp_path / "wds")).collect()
    path = sorted(man, key=lambda r: r["shard_id"])[0]["path"]
    with tarfile.open(path) as tf:
        names = [m.name for m in tf.getmembers()]
        for m in tf.getmembers():
            assert m.mtime == 0 and m.uid == 0 and m.uname == ""
    keys = [n.rsplit(".", 1)[0] for n in names]
    assert keys == sorted(keys, key=lambda k: (k, ))  # img then txt per key
    # each key appears exactly twice (image member + caption member)
    assert all(keys.count(k) == 2 for k in set(keys))


def test_stream_webdataset_exactly_once(spark, pairs_pdf, tmp_path):
    import os

    from webcrawler_spark.streaming.webdataset import stream_webdataset

    feed = tmp_path / "feed"
    feed.mkdir()
    chunks = [pairs_pdf.iloc[:16], pairs_pdf.iloc[16:32], pairs_pdf.iloc[32:]]

    def drop(i):
        # one plain parquet file per drop, ascending mtimes so the file
        # source's oldest-first ordering matches drop order
        p = str(feed / f"part_{i}.parquet")
        chunks[i].to_parquet(p, index=False)
        os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))

    out, ckpt = str(tmp_path / "wds"), str(tmp_path / "ckpt")
    drop(0)
    drop(1)
    assert stream_webdataset(spark, str(feed), out, ckpt, budget_bytes=64 * 1024) == 2
    # a third file lands; same checkpoint → only the new file is exported
    drop(2)
    assert stream_webdataset(spark, str(feed), out, ckpt, budget_bytes=64 * 1024) == 1
    # idle pass: nothing new → nothing exported
    assert stream_webdataset(spark, str(feed), out, ckpt, budget_bytes=64 * 1024) == 0

    # union of all batch shards round-trips to exactly the full input
    back = {
        r["key"]: r
        for r in read_webdataset(spark, out + "/batch=*/shard-*.tar").collect()
    }
    assert len(back) == len(pairs_pdf)
    for _, p in pairs_pdf.iterrows():
        b = back[p["image_id"]]
        assert bytes(b["bytes"]) == bytes(p["bytes"])
        assert b["caption"] == p["caption"]

    # manifest: every row's measured tar_bytes matches the file on disk
    # (batch_id comes back as the partition column of the _manifest root)
    man = spark.read.parquet(out + "/_manifest").collect()
    assert {int(m["batch_id"]) for m in man} == {0, 1, 2}
    assert sum(m["n_samples"] for m in man) == len(pairs_pdf)
    for m in man:
        assert os.path.getsize(m["path"]) == m["tar_bytes"]

    # reused out_dir with a FRESH checkpoint would replay batch ids over
    # stale markers and silently skip new data — must refuse loudly
    with pytest.raises(RuntimeError, match="fresh"):
        stream_webdataset(
            spark, str(feed), out, str(tmp_path / "ckpt2"),
            budget_bytes=64 * 1024,
        )


def test_plan_null_bucket_fails_fast(spark, pairs_pdf):
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(pairs_pdf)
    bkt = F.when(
        F.col("image_id") != "img0000000003",
        (F.substring("image_id", 4, 10).cast("long") / 16).cast("long"),
    )  # NULL for one row
    with pytest.raises(Exception, match="NULL bucket"):
        plan_wds_shards(pairs, budget_bytes=64 * 1024, bucket=bkt).collect()


def test_null_caption_fails_fast(spark, pairs_pdf, tmp_path):
    pdf = pairs_pdf.copy()
    pdf.loc[pdf.index[0], "caption"] = None
    pairs = spark.createDataFrame(pdf)
    bkt = (F.substring("image_id", 4, 10).cast("long") / 16).cast("long")
    planned = plan_wds_shards(
        pairs,
        budget_bytes=64 * 1024,
        bucket=bkt,
        cap_len=F.coalesce(F.octet_length("caption"), F.lit(0)),
    )
    with pytest.raises(Exception, match="null caption"):
        write_webdataset(planned, str(tmp_path / "wds")).collect()
