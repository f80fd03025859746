"""Real uncompressed RIFF AVI decode (+ encode fixture).

`parse_avi` must honor the DIB layout quirks — bottom-up row order,
4-byte row padding, BGR byte order — so beyond round-trip equality, a
golden AVI is assembled BYTE BY HAND here (independent of encode_avi)
with an asymmetric frame whose corners pin each quirk; `decode_video`'s
BT.601 luma reduction gets an integer twin; `sample_frames` runs over
real AVI bytes end to end.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from webcrawler_spark.multimodal.av import (
    decode_video,
    encode_avi,
    parse_avi,
    sample_frames,
    synth_avi,
    synth_video,
)


@pytest.mark.parametrize("shape,fps", [
    ((3, 5, 7), 12),        # gray, width needs padding (7 % 4 != 0)
    ((2, 4, 6, 3), 25),     # RGB, 18-byte rows pad to 20
    ((1, 3, 4), 6),         # gray, no padding
    ((4, 2, 2, 3), 30),     # RGB, tiny
])
def test_avi_roundtrip(shape, fps):
    rng = np.random.default_rng(hash(shape) % 2**31)
    fr = rng.integers(0, 255, shape, dtype=np.uint8)
    back, got_fps = parse_avi(encode_avi(fr, fps))
    assert got_fps == fps
    assert back.shape == fr.shape
    assert np.array_equal(back, fr)


def _hand_built_avi() -> tuple[bytes, np.ndarray]:
    """A minimal 1-frame 2x3 RGB AVI assembled from raw struct packs —
    shares no code with encode_avi. Frame (top-down RGB):
        row0: RED   GREEN BLUE
        row1: WHITE BLACK GRAY(7,8,9)
    In the file this must appear bottom-up and BGR, rows padded 9→12."""
    frame = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[255, 255, 255], [0, 0, 0], [7, 8, 9]]], dtype=np.uint8)
    # DIB payload written by hand: row1 first (bottom-up), BGR, pad 3
    dib = bytes([255, 255, 255, 0, 0, 0, 9, 8, 7]) + b"\x00" * 3 \
        + bytes([0, 0, 255, 0, 255, 0, 255, 0, 0]) + b"\x00" * 3

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b"")

    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 240, 0, 0, 1, 0, 1,
                       24, 3, 2, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0,
                       0, 0, 1, 10, 0, 1, 24, 0xFFFFFFFF, 0, 0, 0, 3, 2)
    strf = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, 24, 0, 0, 0, 0)
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi = chunk(b"LIST", b"movi" + chunk(b"00db", dib))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body, frame


def test_parse_avi_golden_hand_built_layout():
    data, frame = _hand_built_avi()
    got, fps = parse_avi(data)
    assert fps == 10
    assert got.shape == (1, 2, 3, 3)
    assert np.array_equal(got[0], frame)
    # and encode_avi reproduces a stream parse_avi reads identically
    back, _ = parse_avi(encode_avi(frame[None, ...], 10))
    assert np.array_equal(back[0], frame)


def test_parse_avi_rejects_codecs_and_junk():
    good = synth_avi(0)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"\x00\x01\x02\x03" + good[4:])
    # flip the stream handler fourcc to a real codec
    i = good.index(b"DIB ")
    with pytest.raises(NotImplementedError, match="codec"):
        parse_avi(good[:i] + b"xvid" + good[i + 4:])
    with pytest.raises(ValueError, match="no uncompressed video"):
        parse_avi(good[:40])


def test_decode_video_avi_luma_twin():
    data = synth_avi(3, rgb=True)
    frames_rgb, fps = parse_avi(data)
    gray, fps2 = decode_video(data)
    assert fps == fps2 and gray.shape == frames_rgb.shape[:3]
    rgb = frames_rgb.astype(np.int32)
    want = ((299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2])
            // 1000).astype(np.uint8)
    assert np.array_equal(gray, want)
    # gray AVI passes straight through
    g = synth_avi(4, rgb=False)
    direct, _ = parse_avi(g)
    via, _ = decode_video(g)
    assert np.array_equal(direct, via)
    # fake-codec WCVI stream still decodes; mp4 still raises
    decode_video(synth_video(1))
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00 ftypisom-mp4-header")


def test_sample_frames_over_real_avi(spark):
    clips = [("v0", synth_avi(0, frames=8, rgb=False)),
             ("v1", synth_avi(1, frames=8, rgb=True)),
             ("v2", synth_video(2))]  # fake-codec stream mixes in fine
    df = spark.createDataFrame(clips, "video_id string, bytes binary")
    rows = sample_frames(df, every_n=4).collect()
    by_vid: dict = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert set(by_vid) == {"v0", "v1", "v2"}
    assert sorted(r["frame_idx"] for r in by_vid["v0"]) == [0, 4]
    # mean luminance matches a direct numpy recompute on decoded frames
    for vid, data in clips[:2]:
        frames, _ = decode_video(bytes(data))
        for r in by_vid[vid]:
            want = round(float(frames[r["frame_idx"]].mean()), 4)
            assert r["mean_lum"] == want
