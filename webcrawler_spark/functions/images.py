"""Image payload operators — pure-numpy codecs, perceptual hash, PSNR.

The graft payload (BASELINE.json ``input_hint``) is a table of
``(image_id, bytes, w, h, fmt, caption, phash)`` rows with per-row
invariants: decoded pixels allclose to ground truth (PSNR ≥ 40 dB for the
lossy format), recomputed phash == stored phash, caption exact-equal.

PIL/opencv are not in this container, so the container format is our own
deterministic codec (public techniques only — zlib per RFC 1950 and the
type-II DCT used by JPEG):

* fmt='png'  → WCIM codec 0: zlib-compressed raw RGB (lossless)
* fmt='jpeg' → WCIM codec 1: 8×8 block DCT on YCbCr, quantized with the
  standard JPEG luminance/chrominance tables scaled to quality 95, int16
  coefficients zlib-compressed (lossy; PSNR well above 40 dB on natural
  gradients)

Everything is vectorized numpy; the Spark surface is Arrow-batched pandas
UDFs (``phash_udf``, ``decode_meta_udf``) and ``mapInPandas`` pipelines in
``webcrawler_spark.multimodal``. No per-row Python at the DataFrame level.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"WCIM"
CODEC_LOSSLESS = 0
CODEC_DCT = 1

# Standard JPEG Annex K quantization tables (public domain, ITU T.81)
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    # libjpeg quality scaling law (public): s = 5000/q for q<50 else 200-2q
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    t = np.floor((q * s + 50) / 100)
    return np.clip(t, 1, 255)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: X_dct = D @ x @ D.T."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0, :] = np.sqrt(1.0 / n)
    return d


_D8 = _dct_matrix(8)
_D32 = _dct_matrix(32)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    m = np.array([
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ])
    out = rgb.astype(np.float64) @ m.T
    out[..., 1:] += 128.0
    return out


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    ycc = ycc.copy()
    ycc[..., 1:] -= 128.0
    m = np.array([
        [1.0, 0.0, 1.402],
        [1.0, -0.344136, -0.714136],
        [1.0, 1.772, 0.0],
    ])
    return ycc @ m.T


def _blockify(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a 2-D channel to multiples of 8 and return (nblocks,8,8)."""
    h, w = ch.shape
    ph, pw = (-h) % 8, (-w) % 8
    ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    hh, ww = ch.shape
    blocks = ch.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, hh, ww


def _unblockify(blocks: np.ndarray, hh: int, ww: int, h: int, w: int) -> np.ndarray:
    ch = blocks.reshape(hh // 8, ww // 8, 8, 8).transpose(0, 2, 1, 3).reshape(hh, ww)
    return ch[:h, :w]


def encode_image(pixels: np.ndarray, fmt: str, quality: int = 95) -> bytes:
    """Encode an (H, W, 3) uint8 array. fmt ∈ {'png' (lossless), 'jpeg' (lossy)}."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w = pixels.shape[:2]
    if fmt == "png":
        payload = zlib.compress(pixels.tobytes(), 6)
        header = MAGIC + struct.pack("<BBHHB", 1, CODEC_LOSSLESS, w, h, 3)
        return header + payload
    if fmt == "jpeg":
        ycc = _rgb_to_ycbcr(pixels) - 128.0
        coefs = []
        for c in range(3):
            q = _quality_scale(_Q_LUMA if c == 0 else _Q_CHROMA, quality)
            blocks, hh, ww = _blockify(ycc[..., c])
            dct = np.einsum("ij,njk,lk->nil", _D8, blocks, _D8)
            coefs.append(np.round(dct / q).astype(np.int16))
        payload = zlib.compress(np.concatenate([c.ravel() for c in coefs]).tobytes(), 6)
        header = MAGIC + struct.pack("<BBHHB", 1, CODEC_DCT, w, h, 3) + struct.pack(
            "<B", quality
        )
        return header + payload
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Decode WCIM bytes to an (H, W, 3) uint8 array."""
    if data[:4] != MAGIC:
        raise ValueError("bad magic")
    ver, codec, w, h, ch = struct.unpack("<BBHHB", data[4:11])
    if codec == CODEC_LOSSLESS:
        raw = zlib.decompress(data[11:])
        return np.frombuffer(raw, np.uint8).reshape(h, w, ch)
    if codec == CODEC_DCT:
        quality = struct.unpack("<B", data[11:12])[0]
        raw = np.frombuffer(zlib.decompress(data[12:]), np.int16).astype(np.float64)
        hh, ww = h + ((-h) % 8), w + ((-w) % 8)
        nb = (hh // 8) * (ww // 8)
        out = np.empty((h, w, 3), np.float64)
        off = 0
        for c in range(3):
            q = _quality_scale(_Q_LUMA if c == 0 else _Q_CHROMA, quality)
            blocks = raw[off:off + nb * 64].reshape(nb, 8, 8) * q
            off += nb * 64
            idct = np.einsum("ji,njk,kl->nil", _D8, blocks, _D8)
            out[..., c] = _unblockify(idct, hh, ww, h, w)
        rgb = _ycbcr_to_rgb(out + 128.0)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"unknown codec {codec}")


def resize_area(pixels: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Area-mean resize when dims divide evenly, else nearest-neighbor."""
    h, w = pixels.shape[:2]
    if h % th == 0 and w % tw == 0:
        fh, fw = h // th, w // tw
        v = pixels.reshape(th, fh, tw, fw, -1).mean(axis=(1, 3))
        return v.squeeze(-1) if pixels.ndim == 2 else v
    yi = (np.arange(th) * h // th).clip(0, h - 1)
    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
    return pixels[yi][:, xi]


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64).

    grayscale (BT.601) → 32×32 area resize → 2-D DCT → top-left 8×8
    coefficients → bit i = coeff_i > median(coeffs[1:]) (DC excluded from
    the median), MSB-first.
    """
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = resize_area(gray, 32, 32)
    dct = _D32 @ small @ _D32.T
    block = dct[:8, :8].ravel()
    med = np.median(block[1:])
    bits = block > med
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; identical images → 99.0."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return float(min(99.0, 10.0 * np.log10(255.0 ** 2 / mse)))


# ---------------------------------------------------------------------------
# Spark surface — Arrow-vectorized pandas UDFs
# ---------------------------------------------------------------------------

def make_phash_udf():
    """Recompute the perceptual hash from image bytes (invariant check X16)."""

    @F.pandas_udf(T.LongType())
    def phash_udf(data: pd.Series) -> pd.Series:
        return data.map(lambda b: phash64(decode_image(bytes(b))))

    return phash_udf


_META_SCHEMA = T.StructType([
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("mean_lum", T.DoubleType()),
])


def make_decode_meta_udf():
    """Decode and report shape + mean luminance — the cheap 'did the decode
    round-trip' probe used in pipelines that don't need pixels downstream."""

    @F.pandas_udf(_META_SCHEMA)
    def decode_meta_udf(data: pd.Series) -> pd.DataFrame:
        rows = []
        for b in data:
            px = decode_image(bytes(b))
            lum = float((px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).mean())
            rows.append((px.shape[1], px.shape[0], px.shape[2], lum))
        return pd.DataFrame(rows, columns=["w", "h", "channels", "mean_lum"])

    return decode_meta_udf
