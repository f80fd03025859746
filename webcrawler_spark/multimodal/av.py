"""Audio/video multimodal plumbing — opaque binary columns + typed
metadata, with the Spark-side contract (schema, Arrow batch shape,
partition sizing) fully real and the codec layer stubbed.

Per the build brief: real audio/video codec libraries are not in this
container, so decode is either (a) the deterministic WCAU fake codec
below — a seeded PCM generator whose bytes round-trip, so the whole
pipeline is testable end-to-end — or (b) ``NotImplementedError`` for
real container formats (mp3/mp4/...), clearly marking the swap point.
A production deployment replaces ``decode_audio``/``sample_frames``
bodies with ffmpeg/torchaudio calls; nothing else changes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_MAGIC = b"WCAU"
VIDEO_MAGIC = b"WCVI"


# ---------------------------------------------------------------------------
# deterministic fake codecs (testable stand-ins)
# ---------------------------------------------------------------------------

def encode_audio_fake(samples: np.ndarray, sample_rate: int) -> bytes:
    assert samples.dtype == np.int16 and samples.ndim == 1
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, len(samples)) + samples.tobytes()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 mono samples, sample_rate). Real formats raise —
    the clearly-marked production swap point."""
    if data[:4] == AUDIO_MAGIC:
        rate, n = struct.unpack("<II", data[4:12])
        return np.frombuffer(data[12:12 + 2 * n], dtype=np.int16), rate
    raise NotImplementedError(
        "real audio codecs (mp3/ogg/flac) unavailable in this container; "
        "swap decode_audio with ffmpeg/torchaudio in production"
    )


def encode_video_fake(frames: np.ndarray, fps: int) -> bytes:
    """frames: (n, h, w) uint8 grayscale."""
    assert frames.dtype == np.uint8 and frames.ndim == 3
    n, h, w = frames.shape
    return VIDEO_MAGIC + struct.pack("<IIII", fps, n, h, w) + frames.tobytes()


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] == VIDEO_MAGIC:
        fps, n, h, w = struct.unpack("<IIII", data[4:20])
        return np.frombuffer(data[20:20 + n * h * w], dtype=np.uint8).reshape(n, h, w), fps
    raise NotImplementedError(
        "real video codecs (mp4/webm) unavailable in this container; "
        "swap decode_video with ffmpeg in production"
    )


def synth_audio(seed: int, seconds: float = 1.0, rate: int = 8000) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * rate)) / rate
    f = float(rng.uniform(100, 1000))
    wave = (np.sin(2 * np.pi * f * t) * 12000).astype(np.int16)
    return encode_audio_fake(wave, rate)


def synth_video(seed: int, frames: int = 16, h: int = 24, w: int = 32, fps: int = 8) -> bytes:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w), dtype=np.uint8)
    stack = np.stack([np.roll(base, i, axis=1) for i in range(frames)])
    return encode_video_fake(stack, fps)


# ---------------------------------------------------------------------------
# Spark plumbing (real; Arrow-batched mapInPandas)
# ---------------------------------------------------------------------------

def audio_features(audio: DataFrame) -> DataFrame:
    """(clip_id, bytes) → duration, rms, zero-crossing rate."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, b in zip(pdf["clip_id"], pdf["bytes"]):
                samples, rate = decode_audio(bytes(b))
                x = samples.astype(np.float64) / 32768.0
                rows.append((
                    cid,
                    round(len(samples) / rate, 6),
                    round(float(np.sqrt(np.mean(x ** 2))), 6),
                    round(float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))), 6),
                ))
            yield pd.DataFrame(rows, columns=["clip_id", "duration_s", "rms", "zcr"])

    return audio.mapInPandas(
        feats, schema="clip_id string, duration_s double, rms double, zcr double"
    )


def sample_frames(video: DataFrame, every_n: int = 4) -> DataFrame:
    """(video_id, bytes) → one row per sampled frame with mean luminance —
    the frame-sampling stage of a video training pipeline."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, idxs, lums = [], [], []
            for vid, b in zip(pdf["video_id"], pdf["bytes"]):
                frames, fps = decode_video(bytes(b))
                for i in range(0, len(frames), every_n):
                    vids.append(vid)
                    idxs.append(i)
                    lums.append(round(float(frames[i].mean()), 4))
            yield pd.DataFrame({"video_id": vids, "frame_idx": idxs, "mean_lum": lums})

    return video.mapInPandas(
        sample, schema="video_id string, frame_idx int, mean_lum double"
    )
