"""Image quality stats (multimodal/quality.py): closed-form handcrafted
cases, gate logic, and bit-exact equality between the Spark Arrow stage
and the direct numpy twin on the deterministic fixture corpus."""

from __future__ import annotations

import math

import numpy as np
import pytest

from webcrawler_spark.functions.images import decode_image, encode_image
from webcrawler_spark.multimodal.quality import (
    image_quality_stats,
    luma_stats,
    quality_gates,
)


def _img_df(spark, items):
    return spark.createDataFrame(
        [(i, encode_image(px, "png")) for i, px in items],
        "image_id string, bytes binary",
    )


def test_constant_image_is_flat_and_blurry(spark):
    px = np.full((32, 32, 3), 77, dtype=np.uint8)
    row = quality_gates(image_quality_stats(_img_df(spark, [("c", px)]))).collect()[0]
    assert row.luma_std == 0.0
    assert row.lap_var == 0.0
    assert row.entropy == 0.0  # one occupied histogram bin
    assert row.is_flat and row.is_blurry and not row.keep


def test_checkerboard_closed_form(spark):
    # alternating 0/255 grayscale checkerboard: luma alternates 0/255,
    # every interior Laplacian is ±4*255... sign-alternating with mean 0,
    # so lap_var = (4*255)^2 exactly; entropy = 1 bit (two equal bins)
    n = 16
    g = np.indices((n, n)).sum(axis=0) % 2
    px = np.repeat((g * 255).astype(np.uint8)[..., None], 3, axis=-1)
    row = image_quality_stats(_img_df(spark, [("cb", px)])).collect()[0]
    # interior Laplacian: a 255-center has four 0-neighbours → 4*255=1020;
    # a 0-center → -1020; the signs balance, so var = 1020²
    assert row.lap_var == pytest.approx(1020.0 ** 2, rel=1e-12)
    assert row.luma_mean == pytest.approx(127.5, abs=1e-9)
    assert row.entropy == pytest.approx(1.0, abs=1e-12)
    assert row.dark_frac == pytest.approx(0.5) and row.bright_frac == pytest.approx(0.5)


def test_extreme_exposure_gate(spark):
    g = np.indices((16, 16)).sum(axis=0) % 2
    px = np.repeat((g * 255).astype(np.uint8)[..., None], 3, axis=-1)
    row = quality_gates(image_quality_stats(_img_df(spark, [("cb", px)]))).collect()[0]
    # dark+bright = 1.0 > 0.9 → junk despite high lap_var
    assert row.is_extreme and not row.keep


def test_linear_ramp_is_smooth_but_not_flat(spark):
    # horizontal ramp 0..255: std large (not flat) but the second
    # derivative is ~0 away from quantization steps → tiny lap_var
    ramp = np.linspace(0, 255, 64).astype(np.uint8)
    px = np.repeat(np.tile(ramp, (64, 1))[..., None], 3, axis=-1)
    row = quality_gates(image_quality_stats(_img_df(spark, [("r", px)]))).collect()[0]
    assert row.luma_std > 50.0 and not row.is_flat
    assert row.lap_var < 25.0 and row.is_blurry  # smooth gradient = defocus-like


def test_noise_image_keeps(spark):
    r = np.random.default_rng(7)
    px = r.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    row = quality_gates(image_quality_stats(_img_df(spark, [("n", px)]))).collect()[0]
    assert not row.is_flat and not row.is_blurry and not row.is_extreme and row.keep
    assert row.entropy > 5.0  # near-uniform 64-bin histogram → ~6 bits


def test_spark_stage_equals_numpy_twin_on_fixture_corpus(spark):
    from webcrawler_spark.sources.fixtures import make_images

    pdf = make_images(24)
    imgs = spark.createDataFrame(pdf[["image_id", "bytes"]])
    got = {r.image_id: r for r in image_quality_stats(imgs).collect()}
    assert len(got) == 24
    for _, row in pdf.iterrows():
        exp = luma_stats(decode_image(bytes(row["bytes"])))
        g = got[row["image_id"]]
        assert (g.luma_mean, g.luma_std, g.lap_var, g.dark_frac, g.bright_frac, g.entropy) == exp


def test_entropy_upper_bound():
    # entropy can never exceed log2(bins)
    r = np.random.default_rng(11)
    px = r.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert luma_stats(px)[5] <= math.log2(64) + 1e-12
