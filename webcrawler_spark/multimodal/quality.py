"""Decoded-pixel image quality statistics — the screening filters an
image training pipeline runs right after decode (LAION-5B §3 discards
tiny/degenerate images; DataComp and commercial pipelines add blur and
exposure gates):

* luma mean / std (BT.601 luminance) — flat/degenerate detection,
* variance of the 4-neighbour Laplacian — the classic blur metric
  (Pech-Pacheco et al. 2000, "variance of Laplacian" focus measure),
* under-/over-exposed pixel fractions (luma < 16 / > 239 — the ITU
  studio-swing footroom/headroom),
* Shannon entropy of the 64-bin luma histogram — content richness.

All per-image math is vectorized numpy inside ONE Arrow ``mapInPandas``
stage (rows are multi-MB; the session caps Arrow batches, so executor
memory is bounded by batch_size × image_size). No SQL oracle exists for
pixel decode, so the driver row is rows-only; the SEMANTICS are pinned by
tests/test_image_quality.py: handcrafted images with known-closed-form
stats (constant, checkerboard, linear ramp) and a bit-exact recompute of
the Spark output against direct numpy on the fixture corpus.

Scale shape (100 TB): embarrassingly parallel per-row compute after a
parquet scan that reads ONLY (image_id, bytes) — thresholds are applied
downstream as narrow boolean columns so the gate composes with the
alignment/dedup funnel without another pass over the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.images import decode_image

# gate defaults (tuned on the fixture corpus; production would calibrate)
FLAT_STD = 8.0        # luma std below this = near-constant image
BLUR_LAPVAR = 25.0    # Laplacian variance below this = blurry/flat
EXTREME_FRAC = 0.9    # >90% of pixels clipped dark+bright = junk

_HIST_BINS = 64


def luma_stats(px: np.ndarray) -> tuple[float, float, float, float, float, float]:
    """(mean, std, lap_var, dark_frac, bright_frac, entropy) of one
    decoded HxWx3 uint8 image — pure numpy, shared by the Spark stage and
    the tests' recompute twin."""
    y = (
        0.299 * px[..., 0].astype(np.float64)
        + 0.587 * px[..., 1].astype(np.float64)
        + 0.114 * px[..., 2].astype(np.float64)
    )
    mean = float(y.mean())
    std = float(y.std())
    if y.shape[0] >= 3 and y.shape[1] >= 3:
        core = y[1:-1, 1:-1]
        lap = 4.0 * core - y[:-2, 1:-1] - y[2:, 1:-1] - y[1:-1, :-2] - y[1:-1, 2:]
        lap_var = float(lap.var())
    else:
        lap_var = 0.0
    dark = float((y < 16.0).mean())
    bright = float((y > 239.0).mean())
    hist, _ = np.histogram(y, bins=_HIST_BINS, range=(0.0, 256.0))
    p = hist / y.size
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    return mean, std, lap_var, dark, bright, entropy


STATS_SCHEMA = (
    "image_id string, luma_mean double, luma_std double, lap_var double, "
    "dark_frac double, bright_frac double, entropy double"
)


def image_quality_stats(images: DataFrame) -> DataFrame:
    """One Arrow stage: (image_id, bytes) → per-image quality stats."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [luma_stats(decode_image(bytes(b))) for b in pdf["bytes"]]
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "luma_mean": [r[0] for r in rows],
                    "luma_std": [r[1] for r in rows],
                    "lap_var": [r[2] for r in rows],
                    "dark_frac": [r[3] for r in rows],
                    "bright_frac": [r[4] for r in rows],
                    "entropy": [r[5] for r in rows],
                }
            )

    return images.select("image_id", "bytes").mapInPandas(stats, schema=STATS_SCHEMA)


def quality_gates(
    stats: DataFrame,
    flat_std: float = FLAT_STD,
    blur_lapvar: float = BLUR_LAPVAR,
    extreme_frac: float = EXTREME_FRAC,
) -> DataFrame:
    """Narrow boolean gate columns over the stats frame (composable with
    the alignment/dedup funnel without re-touching bytes)."""
    return stats.select(
        "*",
        (F.col("luma_std") < flat_std).alias("is_flat"),
        (F.col("lap_var") < blur_lapvar).alias("is_blurry"),
        ((F.col("dark_frac") + F.col("bright_frac")) > extreme_frac).alias(
            "is_extreme"
        ),
    ).withColumn(
        "keep", ~F.col("is_flat") & ~F.col("is_blurry") & ~F.col("is_extreme")
    )
