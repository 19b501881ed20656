"""Real-GIF LZW decode semantics (multimodal.py::decode_gif / encode_gif):
growing code widths, dictionary reset at 4096, KwKwK, interlace, sub-block
framing and extension skipping."""

from __future__ import annotations

import numpy as np
import pytest


def _pal(n=16, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (n, 3)).astype(np.uint8)


def test_gif_roundtrip_plain_and_interlaced():
    from aiwhispr_spark.operators.multimodal import decode_gif, encode_gif

    pal = _pal()
    rng = np.random.RandomState(7)
    for h, w, il in [(9, 7, False), (9, 7, True), (64, 33, True), (1, 1, False)]:
        idx = rng.randint(0, 16, (h, w)).astype(np.uint8)
        assert (decode_gif(encode_gif(idx, pal, interlace=il)) == pal[idx]).all()


def test_gif_dict_reset_and_width_growth():
    from aiwhispr_spark.operators.multimodal import decode_gif, encode_gif

    # long highly-repetitive raster drives the LZW table past 4096 →
    # CLEAR emission + reset; random tail keeps widths honest
    rng = np.random.RandomState(11)
    rep = np.tile(np.arange(16, dtype=np.uint8), 600)
    tail = rng.randint(0, 16, 400).astype(np.uint8)
    idx = np.concatenate([rep, tail])[: 100 * 100].reshape(100, 100)
    pal = _pal()
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()


def test_gif_kwkwk_case():
    from aiwhispr_spark.operators.multimodal import decode_gif, encode_gif

    # 'aaaa...' is the canonical KwKwK stream: the encoder emits a code
    # the decoder has not defined yet
    idx = np.zeros((1, 40), dtype=np.uint8)
    pal = _pal(4)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()


def test_gif_binary_palette_min_code_floor():
    from aiwhispr_spark.operators.multimodal import decode_gif, encode_gif

    # 2-color palette → depth 1, but GIF's LZW floor is min_code 2
    idx = (np.indices((5, 9)).sum(axis=0) % 2).astype(np.uint8)
    pal = _pal(2)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()


def test_gif_rejects_non_gif():
    from aiwhispr_spark.operators.multimodal import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"PNG not a gif")


def test_gif_stats_matches_closed_form(spark, tmp_path):
    from aiwhispr_spark.operators.multimodal import gif_stats
    from aiwhispr_spark.sources.synthetic import write_gif_corpus_parquet

    path = str(tmp_path / "gif.parquet")
    write_gif_corpus_parquet(path, n_images=6)
    rows = {r.media_id: r for r in gif_stats(spark.read.parquet(path)).collect()}
    assert len(rows) == 6
    for i in range(6):
        w, h = 5 + i % 4, 6 + i % 5
        r = rows[f"img{i}"]
        assert (r.width, r.height) == (w, h)
        ks = [(x + 2 * y + i) % 16 for x in range(w) for y in range(h)]
        assert r.sum_r == sum((7 * k + 3) % 256 for k in ks)
        assert r.sum_g == sum((11 * k + 5) % 256 for k in ks)
        assert r.sum_b == sum((13 * k + 9) % 256 for k in ks)


def test_gif_lzw_end_code_width_boundary():
    # review finding: when the LAST data code is emitted exactly as the
    # table size reaches 2^width, the decoder bumps its width before
    # reading END — the encoder must emit END one bit wider.  Decode with
    # an oversized n_expected so END parsing is mandatory (no early break).
    from aiwhispr_spark.operators.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    seq = [0, 1, 3, 0, 2, 0, 0, 1, 3, 1, 2, 3]  # flush at next_code == 2^w
    z = _lzw_encode_gif(seq, 2)
    assert _lzw_decode_gif(z, 2, len(seq) + 1000) == seq
