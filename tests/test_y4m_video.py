"""Y4M video decode + frame sampling (multimodal.py::decode_y4m /
video_frame_stats) — the chroma STRIDE is the load-bearing part: C420
payloads interleave skipped UV bytes between luma planes, and a wrong skip
shears every later frame."""

import numpy as np
import pytest

from aiwhispr_spark.operators.multimodal import (
    decode_y4m,
    encode_y4m,
    make_gradient_video,
    video_frame_stats,
)


def test_roundtrip_420_and_mono_same_luma():
    y = ((np.arange(4 * 6 * 8) * 13) % 256).astype(np.uint8).reshape(4, 6, 8)
    for chroma in ("420", "mono"):
        w, h, fn, fd, frames = decode_y4m(encode_y4m(y, fps=(30000, 1001), chroma=chroma))
        assert (w, h, fn, fd) == (8, 6, 30000, 1001)
        np.testing.assert_array_equal(frames, y)


def test_420_chroma_stride_does_not_shear_later_frames():
    # frame 0 all-zero, frame 1 all-255: if the decoder skipped the wrong
    # number of UV bytes (e.g. treated C420 as mono) frame 1 would read the
    # 128-valued chroma plane instead
    y = np.stack([np.zeros((6, 8), np.uint8), np.full((6, 8), 255, np.uint8)])
    _, _, _, _, frames = decode_y4m(encode_y4m(y, chroma="420"))
    assert int(frames[0].sum()) == 0
    assert int(frames[1].sum()) == 255 * 48


def test_decode_errors():
    with pytest.raises(ValueError):
        decode_y4m(b"NOTY4M W8 H6\nFRAME\n" + bytes(48))
    with pytest.raises(ValueError):  # truncated frame body
        decode_y4m(make_gradient_video(1)[:-10])
    with pytest.raises(ValueError):  # C420 odd dims
        decode_y4m(b"YUV4MPEG2 W7 H6 F25:1 C420\nFRAME\n" + bytes(63))
    with pytest.raises(ValueError):  # unsupported chroma
        decode_y4m(b"YUV4MPEG2 W8 H6 F25:1 C422\nFRAME\n" + bytes(96))
    with pytest.raises(ValueError):  # header only, missing dims
        decode_y4m(b"YUV4MPEG2 F25:1\n")


def test_frame_stats_sampling_and_null_row(spark):
    rows = [
        ("ok", make_gradient_video(3)),  # w=8 h=8 n=8 -> sampled 0,3,6
        ("junk", b"\x00\x01\x02"),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = video_frame_stats(df, every_k=3).collect()
    ok = sorted([r for r in out if r.media_id == "ok"], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in ok] == [0, 3, 6]
    f, w, h = 0, 8, 8
    expect = sum((3 * 11 + f * 7 + r * 5 + c * 3) % 251 for r in range(h) for c in range(w))
    assert ok[0].y_sum == expect
    assert ok[0].y_mean_mi == expect * 10000 // 64
    for mid in ("junk", "nul"):
        [r] = [r for r in out if r.media_id == mid]
        assert r.frame_idx is None and r.y_sum is None
