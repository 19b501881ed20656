"""Real-PNG decode semantics (multimodal.py::decode_png / encode_png):
filter-byte reconstruction (Sub/Up/Average/Paeth against RECONSTRUCTED
neighbors), multi-IDAT zlib concatenation, chunk CRC validation, and the
png_stats mapInPandas surface."""

from __future__ import annotations

import numpy as np
import pytest


def _rand_img(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter_type(ftype):
    from aiwhispr_spark.operators.multimodal import decode_png, encode_png

    img = _rand_img(7, 5, seed=ftype)
    payload = encode_png(img, filter_of_row=lambda y: ftype)
    assert (decode_png(payload) == img).all()


def test_png_roundtrip_mixed_filters_multi_idat():
    from aiwhispr_spark.operators.multimodal import decode_png, encode_png

    img = _rand_img(10, 6, seed=99)
    # default filter cycle 0..4 + tiny IDAT pieces: the multi-chunk
    # single-zlib-stream path is guaranteed live
    payload = encode_png(img, idat_piece=16)
    assert payload.count(b"IDAT") >= 2
    assert (decode_png(payload) == img).all()


def test_png_crc_corruption_raises():
    from aiwhispr_spark.operators.multimodal import decode_png, encode_png

    img = _rand_img(4, 4, seed=3)
    data = bytearray(encode_png(img))
    # flip one raster byte inside the first IDAT payload
    at = data.index(b"IDAT") + 4
    data[at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_non_png_and_unsupported_layout():
    from aiwhispr_spark.operators.multimodal import decode_png, encode_png
    import struct
    import zlib

    with pytest.raises(ValueError):
        decode_png(b"GIF89a rubbish")
    # rebuild the IHDR as 8-bit GRAYSCALE (color type 0) with a VALID crc:
    # the layout check must fire, not the crc check
    img = _rand_img(2, 2, seed=5)
    data = bytearray(encode_png(img))
    ihdr_at = data.index(b"IHDR")
    bad = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    data[ihdr_at + 4 : ihdr_at + 4 + 13] = bad
    struct.pack_into(
        ">I", data, ihdr_at + 4 + 13, zlib.crc32(b"IHDR" + bad) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(data))


def test_png_paeth_predictor_tie_break():
    from aiwhispr_spark.operators.multimodal import _paeth

    # ties break left -> up -> up-left (RFC 2083 order)
    assert _paeth(10, 10, 10) == 10
    assert _paeth(4, 8, 6) == 6      # p=6: pa=2, pb=2, pc=0 -> up-left wins
    assert _paeth(0, 0, 0) == 0
    assert _paeth(6, 2, 0) == 6      # p=8: pa=2, pb=6, pc=8 -> left
    assert _paeth(2, 6, 8) == 2      # p=0: pa=2, pb=6, pc=8 -> left
    assert _paeth(5, 5, 9) == 5      # pa==pb==4 < pc: tie picks left


def test_png_stats_matches_closed_form(spark, tmp_path):
    from aiwhispr_spark.operators.multimodal import png_stats
    from aiwhispr_spark.sources.synthetic import write_png_corpus_parquet

    path = str(tmp_path / "png.parquet")
    write_png_corpus_parquet(path, n_images=6)
    rows = {r.media_id: r for r in png_stats(spark.read.parquet(path)).collect()}
    assert len(rows) == 6
    for i in range(6):
        w, h = 5 + i % 4, 6 + i % 5
        r = rows[f"img{i}"]
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        exp_r = sum((3 * x + 8 * y + 2 * i) % 256 for x in range(w) for y in range(h))
        exp_g = sum((7 * x + 5 * y + 3 * i) % 256 for x in range(w) for y in range(h))
        exp_b = sum((x + 13 * y + 7 * i) % 256 for x in range(w) for y in range(h))
        assert (r.sum_r, r.sum_g, r.sum_b) == (exp_r, exp_g, exp_b)
