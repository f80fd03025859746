"""Multimodal column plumbing — binary image payloads through Arrow.

Treats image bytes as opaque binary + typed metadata (BASELINE.json
input_hint schema) and implements decode / feature-extract / resize as
mapInPandas pipelines. The codec is real (webcrawler_spark.functions.images,
pure numpy — PIL/opencv are not in this container); the Spark-side
contract (schema, batch shape, partitioning) is what production would keep
while swapping the codec.

Batch sizing: rows are multi-MB, so sessions should keep
spark.sql.execution.arrow.maxRecordsPerBatch small (session.py sets 2048;
override lower for >1 MB images).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.images import decode_image, encode_image, phash64, psnr, resize_area


def verify_invariants(images: DataFrame) -> DataFrame:
    """Per-row invariant columns (input_hint): decode round-trips (PSNR ≥
    40 dB for lossy / exact for lossless vs a re-encode probe), phash
    recomputes equal. Caption equality is checked by the caller against
    its ground-truth source (exact string compare)."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b, w, h, fmt, ph in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"], pdf["phash"]):
                px = decode_image(bytes(b))
                shape_ok = px.shape == (h, w, 3)
                phash_ok = phash64(px) == ph
                # decode→encode→decode must be stable (idempotent codec)
                px2 = decode_image(encode_image(px, fmt))
                p = psnr(px, px2)
                quality_ok = bool(p >= 40.0) if fmt == "jpeg" else bool((px2 == px).all())
                out.append((shape_ok, phash_ok, quality_ok, p))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "shape_ok": [o[0] for o in out],
                    "phash_ok": [o[1] for o in out],
                    "quality_ok": [o[2] for o in out],
                    "psnr_db": [o[3] for o in out],
                }
            )

    return images.mapInPandas(
        check,
        schema="image_id string, shape_ok boolean, phash_ok boolean, quality_ok boolean, psnr_db double",
    )


def resize_images(images: DataFrame, target: int = 32) -> DataFrame:
    """Decode → area-resize to target×target → re-encode lossless."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = [
                encode_image(
                    np.clip(np.round(resize_area(decode_image(bytes(b)), target, target)), 0, 255).astype(np.uint8),
                    "png",
                )
                for b in pdf["bytes"]
            ]
            yield pd.DataFrame(
                {"image_id": pdf["image_id"], "bytes": data,
                 "w": target, "h": target, "fmt": "png"}
            )

    return images.mapInPandas(
        rz, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def grid_features(images: DataFrame, grid: int = 4) -> DataFrame:
    """Decode → grid×grid mean-color feature vector (array<float>) — the
    embedding-extraction stage of an image training pipeline."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf["bytes"]:
                px = decode_image(bytes(b)).astype(np.float64)
                h, w = px.shape[:2]
                gh, gw = max(h // grid, 1), max(w // grid, 1)
                cells = []
                for gy in range(grid):
                    for gx in range(grid):
                        cell = px[gy * gh:(gy + 1) * gh, gx * gw:(gx + 1) * gw]
                        cells.extend(cell.mean(axis=(0, 1)) / 255.0 if cell.size else [0.0, 0.0, 0.0])
                vecs.append([float(x) for x in cells])
            yield pd.DataFrame({"image_id": pdf["image_id"], "features": vecs})

    return images.mapInPandas(feat, schema="image_id string, features array<float>")
