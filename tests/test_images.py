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
