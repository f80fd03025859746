"""Image codec / phash / PSNR (X16, BASELINE.json input_hint invariants)."""

from __future__ import annotations

import numpy as np
import pytest

from webcrawler_spark.functions.images import (
    decode_image,
    encode_image,
    phash64,
    psnr,
    resize_area,
)
from webcrawler_spark.sources.fixtures import make_images, render_image


def _rand_img(seed, w=48, h=32):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_lossless_roundtrip():
    px = _rand_img(1)
    assert (decode_image(encode_image(px, "png")) == px).all()


def test_lossy_psnr_on_natural_images():
    # random noise is the worst case for DCT coding; the invariant (PSNR
    # ≥ 40 dB) is specified over the fixture's natural gradients
    for i in range(5):
        px, w, h, fmt, _ = render_image(f"img{i}")
        dec = decode_image(encode_image(px, "jpeg"))
        assert dec.shape == (h, w, 3)
        assert psnr(px, dec) >= 40.0, i


def test_phash_deterministic_and_robust():
    px, *_ = render_image("img3")
    h0 = phash64(px)
    assert h0 == phash64(px.copy())
    assert isinstance(h0, int)
    assert -(1 << 63) <= h0 < (1 << 63)
    # jpeg round-trip must not move the perceptual hash far
    dec = decode_image(encode_image(px, "jpeg"))
    dist = bin((h0 ^ phash64(dec)) & ((1 << 64) - 1)).count("1")
    assert dist <= 4
    # a very different image should be far
    other, *_ = render_image("img77")
    dist2 = bin((h0 ^ phash64(other)) & ((1 << 64) - 1)).count("1")
    assert dist2 > 10


def test_psnr_identity_and_bounds():
    px = _rand_img(2)
    assert psnr(px, px) == 99.0
    noisy = np.clip(px.astype(int) + 40, 0, 255).astype(np.uint8)
    assert 0 < psnr(px, noisy) < 99.0


def test_resize_area_exact_divisor():
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = resize_area(px, 4, 4)
    assert out.shape == (4, 4, 3)
    assert np.allclose(out[0, 0], px[0:2, 0:2].mean(axis=(0, 1)))


def test_fixture_images_schema_and_invariants():
    df = make_images(8)
    assert list(df.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    for _, r in df.iterrows():
        px = decode_image(bytes(r["bytes"]))
        truth, w, h, fmt, caption = render_image(r["image_id"])
        assert (r["w"], r["h"], r["fmt"], r["caption"]) == (w, h, fmt, caption)
        assert px.shape == (h, w, 3)
        if fmt == "png":
            assert (px == truth).all()
        else:
            assert psnr(truth, px) >= 40.0
        # stored phash is artifact-anchored: exactly the hash of the
        # decoded stored bytes (so the per-row invariant is exact for
        # lossy formats too), and within a few bits of the ground-truth
        # pixels' hash (perceptual closeness across the lossy encode)
        assert phash64(px) == r["phash"]
        dist = bin((phash64(truth) ^ r["phash"]) & ((1 << 64) - 1)).count("1")
        assert dist == 0 if fmt == "png" else dist <= 8


def test_phash_udf_matches_python(spark):
    from webcrawler_spark.functions.images import make_phash_udf

    pdf = make_images(6)
    sdf = spark.createDataFrame(pdf)
    got = {
        r["image_id"]: r["ph"]
        for r in sdf.select("image_id", make_phash_udf()(sdf["bytes"]).alias("ph")).collect()
    }
    for _, r in pdf.iterrows():
        px = decode_image(bytes(r["bytes"]))
        assert got[r["image_id"]] == phash64(px)


# ---------------------------------------------------------------------------
# phash near-dup banding (dedup/phash.py)
# ---------------------------------------------------------------------------

def _brute_pairs(rows, k):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = sorted((rows[i], rows[j]))
            d = bin((a[1] ^ b[1]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if d <= k:
                out.add((a[0], b[0], d))
    return out


def _i64(x):
    """Wrap an unbounded Python int into signed 64-bit two's complement."""
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def test_phash_neardup_controlled_bit_flips(spark):
    from webcrawler_spark.dedup import phash as ph

    base = -0x123456789ABCDEF0  # negative: exercises sign-extension masking
    rows = [
        ("i0", base),
        ("i1", _i64(base ^ 0b1)),                   # hamming 1
        ("i2", _i64(base ^ (1 << 63) ^ 1)),         # hamming 2, top band
        ("i3", _i64(base ^ 0b111)),                 # hamming 3
        ("i4", _i64(base ^ 0b11110000)),            # hamming 4 — excluded
        ("i5", 0x7FFFFFFFFFFFFFFF),                 # far away
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in ph.phash_near_duplicates(df).collect()
    }
    want = _brute_pairs(rows, 3)
    assert got == want
    assert ("i0", "i1", 1) in got and ("i0", "i4", 4) not in got


def test_phash_neardup_matches_bruteforce_on_fixture_images(spark):
    from webcrawler_spark.dedup import phash as ph
    from webcrawler_spark.functions.images import decode_image

    pdf = make_images(48)
    rows = list(zip(pdf["image_id"], (int(x) for x in pdf["phash"])))
    for i in range(0, 48, 2):
        iid = f"img{i:010d}"
        pixels, _w, _h, _fmt, _cap = render_image(iid)
        data = encode_image(pixels, "jpeg", quality=70)
        rows.append((iid + "_v70", phash64(decode_image(data))))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in ph.phash_near_duplicates(df).collect()
    }
    assert got == _brute_pairs(rows, 3)
    assert got, "fixture corpus must produce near-dup pairs (non-vacuous)"


def test_phash_clusters_canonical_election(spark):
    from webcrawler_spark.dedup import phash as ph

    base = 0x0F0F0F0F0F0F0F0F
    rows = [
        ("a1", base), ("a2", base ^ 1), ("a3", base ^ 2),   # one cluster
        ("b1", -42), ("b2", -42 ^ (1 << 40)),                # another
        ("c1", 0x1234),                                      # singleton: absent
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    cl = {r["image_id"]: r for r in ph.phash_clusters(df).collect()}
    assert set(cl) == {"a1", "a2", "a3", "b1", "b2"}
    assert all(cl[i]["cluster_id"] == "a1" for i in ("a1", "a2", "a3"))
    assert cl["a1"]["is_canonical"] and cl["a1"]["cluster_size"] == 3
    assert cl["b1"]["cluster_id"] == "b1" and cl["b2"]["cluster_size"] == 2
