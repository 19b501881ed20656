"""Real-BMP decode semantics (multimodal.py::decode_bmp / encode_bmp) and
the tracker-script page signal (linkgraph.py::tracker_script_signals)."""

from __future__ import annotations

import numpy as np
import pytest


def test_bmp_roundtrip_identity_with_stride_padding():
    from aiwhispr_spark.operators.multimodal import decode_bmp, encode_bmp

    # width 5 → 15-byte rows pad to 16: the stride path is live
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()


def test_bmp_top_down_negative_height():
    from aiwhispr_spark.operators.multimodal import decode_bmp, encode_bmp
    import struct

    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    data = bytearray(encode_bmp(img))
    # flip height to negative (top-down) and reverse the raster rows to match
    (h,) = struct.unpack_from("<i", data, 14 + 8)
    struct.pack_into("<i", data, 14 + 8, -h)
    off = 54
    stride = ((4 * 3 + 3) // 4) * 4
    rows = [bytes(data[off + r * stride : off + (r + 1) * stride]) for r in range(h)]
    data[off:] = b"".join(reversed(rows))
    assert (decode_bmp(bytes(data)) == img).all()


def test_bmp_rejects_non_bmp_and_unsupported_bpp():
    from aiwhispr_spark.operators.multimodal import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"PNG rubbish")


def test_tracker_signals_hand_computed(spark):
    from aiwhispr_spark.operators.linkgraph import tracker_script_signals

    html = (
        '<script>inline();</script>'
        '<script src="/js/app.js"></script>'
        '<script async src="https://cdn.shared.example/lib.js"></script>'
        '<script src="https://analytics.trk.example/t.js"></script>'
        '<script src="https://site.example.org/self.js"></script>'
        "<p>&lt;script&gt; entity text and the word script</p>"
    )
    pages = spark.createDataFrame(
        [("https://site.example.org/p", html), ("https://x.example.org/q", "<p>no scripts</p>")],
        "url string, html string",
    )
    out = {r.url: r for r in tracker_script_signals(pages).collect()}
    r = out["https://site.example.org/p"]
    assert r.n_scripts == 5           # inline counts; escaped entity does not
    assert r.n_external == 4
    assert r.n_third_party == 2       # cdn + analytics; self-host and relative are first-party
    assert r.n_tracker == 1
    assert r.tracker_density_i == 10000 // 5
    q = out["https://x.example.org/q"]
    assert q.n_scripts == 0 and q.tracker_density_i == -1
