"""WAV audio decode tests (multimodal.decode_wav / wav_audio_features) —
round-trip, chunk walking, corrupt-payload surfacing; the driver gate
(`wav_audio_features`) checks every stat closed-form from the square-wave
fixture arithmetic."""

import numpy as np
import pytest

from aiwhispr_spark.operators.multimodal import (
    decode_wav,
    encode_wav,
    wav_audio_features,
)


def _square(n, h, a):
    return np.where((np.arange(n) // h) % 2 == 0, a, -a).astype(np.int16)


def test_roundtrip_mono_and_stereo():
    mono = _square(40, 4, 1200)
    rate, nch, dec = decode_wav(encode_wav(mono, 16000))
    assert (rate, nch) == (16000, 1) and (dec[:, 0] == mono).all()
    stereo = np.stack([mono, (mono // 3).astype(np.int16)], axis=1)
    rate, nch, dec = decode_wav(encode_wav(stereo, 8000))
    assert (rate, nch) == (8000, 2) and (dec == stereo).all()


def test_chunk_walker_skips_list_and_respects_word_alignment():
    wav = encode_wav(_square(16, 2, 100), 8000)
    # odd-sized LIST chunk + pad byte between header and fmt
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = wav[:12] + extra + wav[12:]
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    rate, nch, dec = decode_wav(spliced)
    assert rate == 8000 and dec.shape == (16, 1)


@pytest.mark.parametrize(
    "payload",
    [b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE", b"total junk bytes here"],
)
def test_bad_payloads_raise(payload):
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_non_pcm16_rejected():
    wav = bytearray(encode_wav(_square(8, 2, 10), 8000))
    # patch bits-per-sample (fmt body offset 14) to 8
    fmt_pos = wav.index(b"fmt ")
    wav[fmt_pos + 8 + 14 : fmt_pos + 8 + 16] = (8).to_bytes(2, "little")
    with pytest.raises(ValueError):
        decode_wav(bytes(wav))


def test_features_exact_and_corrupt_row_surfaces_null(spark):
    n, h, a = 24, 3, 700
    rows = [
        ("good", bytearray(encode_wav(_square(n, h, a), 8000))),
        ("bad", bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in wav_audio_features(df).collect()}
    g = got["good"]
    assert g["n_frames_l"] == n
    assert g["sum_sq_l"] == n * a * a
    assert g["n_zero_cross_l"] == n // h - 1
    assert g["duration_ms_i"] == n * 1000 // 8000
    b = got["bad"]  # corrupt rows surface as NULL stats, never vanish
    assert b["sample_rate_i"] is None and b["sum_sq_l"] is None


def test_null_and_zero_channel_payloads_yield_null_stats(spark):
    # n_channels=0 in the fmt chunk divides by zero inside decode; a NULL
    # payload TypeErrors on bytes(None) — both must degrade to the NULL row.
    good = encode_wav(_square(100, 5, 1000), 8000)
    zero_ch = bytearray(good)
    zero_ch[22:24] = (0).to_bytes(2, "little")  # fmt.n_channels = 0
    df = spark.createDataFrame(
        [("ok", bytearray(good)), ("zch", bytes(zero_ch)), ("nul", None)],
        "media_id string, payload binary",
    )
    got = {r["media_id"]: r for r in wav_audio_features(df).collect()}
    assert got["ok"]["n_frames_l"] == 100
    assert got["zch"]["n_frames_l"] is None
    assert got["nul"]["n_frames_l"] is None


def test_spectral_peak_detects_major_tone_over_minor(spark):
    from aiwhispr_spark.operators.multimodal import make_tone_clip, spectral_peak_features

    rows = [
        ("a", make_tone_clip(peak_bin=17, minor_bin=200)),
        ("b", make_tone_clip(peak_bin=311)),
        ("short", make_tone_clip(peak_bin=5)[:200]),  # truncated container
        ("junk", b"RIFFxxxxWAVE"),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r.media_id: r for r in spectral_peak_features(df).collect()}
    assert out["a"].peak_bin == 17 and out["a"].peak_hz_mi == 17 * 78125
    assert out["b"].peak_bin == 311
    assert out["short"].peak_bin is None  # short/corrupt → NULL, not a crash
    assert out["junk"].peak_bin is None


def test_spectral_peak_dc_offset_is_not_a_tone(spark):
    import numpy as np
    from aiwhispr_spark.operators.multimodal import encode_wav, spectral_peak_features

    t = np.arange(1024, dtype=np.float64)
    x = 8000.0 + 500.0 * np.sin(2.0 * np.pi * 9 * t / 1024)  # huge DC, small tone
    df = spark.createDataFrame(
        [("dc", encode_wav(np.round(x).astype(np.int16), 8000))],
        "media_id string, payload binary",
    )
    [row] = spectral_peak_features(df).collect()
    assert row.peak_bin == 9
