"""Real baseline-TIFF decode semantics (multimodal.py::decode_tiff /
encode_tiff): IFD inline-vs-offset value placement, multi-strip
reassembly, and the tiff_stats mapInPandas surface."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def test_tiff_roundtrip_multi_strip():
    from aiwhispr_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.RandomState(11)
    # h=9 with rows_per_strip=4 → 3 strips (4+4+1): reassembly path live
    img = rng.randint(0, 256, size=(9, 5, 3), dtype=np.uint8)
    assert (decode_tiff(encode_tiff(img, rows_per_strip=4)) == img).all()


def test_tiff_roundtrip_single_strip_inline_values():
    from aiwhispr_spark.operators.multimodal import decode_tiff, encode_tiff

    # one strip → StripOffsets/StripByteCounts are INLINE in the IFD value
    # slot (count*size <= 4), the other placement branch of read_values
    img = np.arange(3 * 4 * 3, dtype=np.uint8).reshape(3, 4, 3)
    payload = encode_tiff(img, rows_per_strip=8)
    assert (decode_tiff(payload) == img).all()


def test_tiff_strip_order_is_load_bearing():
    from aiwhispr_spark.operators.multimodal import decode_tiff, encode_tiff

    img = np.arange(8 * 2 * 3, dtype=np.uint8).reshape(8, 2, 3)
    data = bytearray(encode_tiff(img, rows_per_strip=4))
    # swap the two entries of the strip-offset table (tag 273, type LONG,
    # count 2 → offsets live at the table position, not inline)
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_ent,) = struct.unpack_from("<H", data, ifd_off)
    for k in range(n_ent):
        tag, typ, cnt = struct.unpack_from("<HHI", data, ifd_off + 2 + 12 * k)
        if tag == 273:
            (tbl,) = struct.unpack_from("<I", data, ifd_off + 2 + 12 * k + 8)
            a, b = struct.unpack_from("<II", data, tbl)
            struct.pack_into("<II", data, tbl, b, a)
    out = decode_tiff(bytes(data))
    assert (out[:4] == img[4:]).all() and (out[4:] == img[:4]).all()


def test_tiff_rejects_non_tiff_and_unsupported():
    from aiwhispr_spark.operators.multimodal import decode_tiff, encode_tiff

    with pytest.raises(ValueError):
        decode_tiff(b"MM\x00*big-endian or rubbish")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_tiff(img))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_ent,) = struct.unpack_from("<H", data, ifd_off)
    for k in range(n_ent):
        tag, typ, cnt = struct.unpack_from("<HHI", data, ifd_off + 2 + 12 * k)
        if tag == 259:  # flip Compression to LZW
            struct.pack_into("<I", data, ifd_off + 2 + 12 * k + 8, 5)
    with pytest.raises(ValueError):
        decode_tiff(bytes(data))


def test_tiff_stats_matches_closed_form(spark, tmp_path):
    from aiwhispr_spark.operators.multimodal import tiff_stats
    from aiwhispr_spark.sources.synthetic import write_tiff_corpus_parquet

    path = str(tmp_path / "tiff.parquet")
    write_tiff_corpus_parquet(path, n_images=6)
    rows = {r.media_id: r for r in tiff_stats(spark.read.parquet(path)).collect()}
    assert len(rows) == 6
    for i in range(6):
        w, h = 5 + i % 4, 6 + i % 5
        r = rows[f"img{i}"]
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        exp_r = sum((2 * x + 9 * y + i) % 256 for x in range(w) for y in range(h))
        exp_g = sum((5 * x + 3 * y + 2 * i) % 256 for x in range(w) for y in range(h))
        exp_b = sum((11 * x + 7 * y + 5 * i) % 256 for x in range(w) for y in range(h))
        assert (r.sum_r, r.sum_g, r.sum_b) == (exp_r, exp_g, exp_b)
        assert r.mean_r_i == exp_r * 100 // (w * h)
