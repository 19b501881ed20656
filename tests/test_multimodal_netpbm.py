"""Real image decode through the multimodal pipeline: netpbm payloads
(numpy-only decoder) via register_decoder → mapInPandas feature extraction,
validated against a direct pure-Python computation."""

from __future__ import annotations

import numpy as np
import pytest

from aiwhispr_spark.operators.multimodal import (
    _DECODERS,
    decode_netpbm,
    enable_netpbm_decoder,
    extract_features,
    netpbm_feature,
    resize_nearest,
)


def _pgm_p5(img: np.ndarray) -> bytes:
    h, w = img.shape
    return f"P5 {w} {h} 255\n".encode() + (img * 255).astype(np.uint8).tobytes()


def _pgm_p2(img: np.ndarray) -> bytes:
    h, w = img.shape
    body = " ".join(str(v) for v in (img * 255).astype(np.uint8).ravel())
    return f"P2\n# a comment\n{w} {h}\n255\n{body}\n".encode()


def _ppm_p6(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6 {w} {h} 255\n".encode() + (img * 255).astype(np.uint8).tobytes()


GRAY = np.linspace(0.0, 1.0, 16 * 8).reshape(8, 16).astype(np.float32)
RGB = np.stack([GRAY, GRAY * 0.5, 1.0 - GRAY], axis=2)


def test_decode_roundtrip_variants():
    for payload in (_pgm_p5(GRAY), _pgm_p2(GRAY)):
        img = decode_netpbm(payload)
        assert img.shape == (8, 16)
        assert np.allclose(img, np.round(GRAY * 255) / 255, atol=1 / 255)
    rgb = decode_netpbm(_ppm_p6(RGB))
    assert rgb.shape == (8, 16, 3)
    # 16-bit big-endian binary
    img16 = (GRAY * 65535).astype(">u2")
    payload16 = b"P5 16 8 65535\n" + img16.tobytes()
    assert np.allclose(decode_netpbm(payload16), GRAY, atol=1 / 65535)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_netpbm(b"JFIF not a pnm")
    with pytest.raises(ValueError):
        decode_netpbm(b"P5 16 8 255\nshort")


def test_resize_nearest():
    out = resize_nearest(GRAY, 4, 4)
    assert out.shape == (4, 4)
    assert out[0, 0] == GRAY[0, 0]
    assert resize_nearest(RGB, 2, 3).shape == (2, 3, 3)


def test_real_decode_through_spark_pipeline(spark):
    payloads = {
        "g5": _pgm_p5(GRAY),
        "g2": _pgm_p2(GRAY),
        "rgb": _ppm_p6(RGB),
    }
    media = spark.createDataFrame(
        [(mid, "image", p) for mid, p in payloads.items()],
        "media_id string, kind string, payload binary",
    )
    enable_netpbm_decoder()
    try:
        rows = {r["media_id"]: r for r in extract_features(media).collect()}
    finally:
        _DECODERS.pop("image", None)
    for mid, payload in payloads.items():
        want = netpbm_feature(payload)
        got = np.array(rows[mid]["feature"], dtype=np.float32)
        assert got.shape == (10,)
        assert np.allclose(got, want, atol=1e-6), mid
        assert rows[mid]["n_bytes"] == len(payload)
    # the P5 and P2 encodings of the same image must featurize identically
    assert np.allclose(rows["g5"]["feature"], rows["g2"]["feature"], atol=1e-6)


def test_sniff_media_type_magic_bytes(spark):
    from aiwhispr_spark.operators.multimodal import sniff_media_type

    rows = [
        ("pgm", b"P5 2 2 255 ...."),
        ("wav", b"RIFF\x24\x00\x00\x00WAVEfmt "),
        ("avi", b"RIFF\x24\x00\x00\x00AVI LIST"),
        ("pdf", b"%PDF-1.7 rest"),
        ("zip", b"PK\x03\x04\x14\x00"),
        ("gz", b"\x1f\x8b\x08\x00"),
        ("png", b"\x89PNG\r\n\x1a\n"),
        ("jpg", b"\xff\xd8\xff\xe0\x00\x10JFIF"),
        ("junk", b"\x00\x11\x22"),
        ("short", b"P"),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r.media_id: r.media_type for r in sniff_media_type(df).collect()}
    assert got == {
        "pgm": "netpbm_pgm",
        "wav": "riff_wav",
        "avi": "riff_other",
        "pdf": "pdf",
        "zip": "zip",
        "gz": "gzip",
        "png": "png",
        "jpg": "jpeg",
        "junk": "unknown",
        "short": "unknown",
    }


def test_sniff_media_type_is_pure_jvm(spark):
    from aiwhispr_spark.operators.multimodal import sniff_media_type

    df = spark.createDataFrame([("a", b"x")], "media_id string, payload binary")
    plan = sniff_media_type(df)._jdf.queryExecution().executedPlan().treeString()
    assert "Python" not in plan and "Exchange" not in plan


def test_dhash64_known_bits():
    from aiwhispr_spark.operators.multimodal import dhash64

    # monotone rows: every gradient comparison true -> all 64 bits -> -1
    inc = (np.arange(72, dtype=np.float64).reshape(8, 9)) / 255.0
    assert dhash64(inc) == -1
    # flat image: no strict increase anywhere -> 0
    assert dhash64(np.full((8, 9), 0.5)) == 0
    # flipping ONE gradient flips exactly one bit
    one = inc.copy()
    one[0, 0] = 1.0  # now px[0][0] > px[0][1]
    assert dhash64(one) == -1 - 1  # bit 0 cleared from all-ones
    # RGB collapses by channel mean to the same gray
    rgb = np.repeat(inc[:, :, None], 3, axis=2)
    assert dhash64(rgb) == -1


def test_dhash_banded_join_equals_exhaustive(spark):
    from aiwhispr_spark.operators.multimodal import dhash_near_dup_pairs

    def signed(u: int) -> int:
        u &= (1 << 64) - 1
        return u - (1 << 64) if u >= (1 << 63) else u

    # pseudo-random signatures plus engineered close pairs, including a
    # sign-bit flip (band 3 must still bucket two's-complement values)
    rng = np.random.RandomState(7)
    sigs = [signed(int(x)) for x in rng.randint(0, 2**63 - 1, size=40, dtype=np.uint64)]
    sigs.append(signed(sigs[0] ^ 0b101))       # hamming 2 from sigs[0]
    sigs.append(signed(sigs[1] ^ (1 << 63)))   # hamming 1, sign flips
    df = spark.createDataFrame(
        [(f"s{i:02d}", s) for i, s in enumerate(sigs)], "id string, dhash long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dhash_near_dup_pairs(df, max_hamming=3, bands=4).collect()
    }
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin((sigs[i] ^ sigs[j]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                x, y = sorted([f"s{i:02d}", f"s{j:02d}"])
                want.add((x, y, h))
    assert got == want and len(want) >= 2


def test_image_dhash_skips_null_and_empty_payloads(spark):
    # fetch failures leave NULL/empty binary rows in crawled media tables;
    # the hash stage must skip them, not abort the whole job on bytes(None)
    from aiwhispr_spark.operators.multimodal import image_dhash

    img = np.arange(72, dtype=np.float64).reshape(8, 9) / 255.0
    df = spark.createDataFrame(
        [("ok", _pgm_p5(img)), ("null", None), ("empty", b"")],
        "media_id string, payload binary",
    )
    rows = image_dhash(df).collect()
    assert [r.id for r in rows] == ["ok"]


def test_dhash_threshold_must_stay_under_bands():
    from aiwhispr_spark.operators.multimodal import dhash_near_dup_pairs

    with pytest.raises(ValueError):
        dhash_near_dup_pairs(None, max_hamming=4, bands=4)
