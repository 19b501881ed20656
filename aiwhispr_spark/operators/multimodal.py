"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, batch shapes, partition discipline) is real
and tested; the actual media decoding is stubbed (image/audio libraries are
not in this container) behind ``register_decoder`` — the same plug-point shape
as the reference's doc-type → extractor dispatch (U5,
initializeDocumentProcessor.py:27-62, suffix map aiwhisprConstants.py:11-29).

Design rules for 100 TB of media:
* binary payloads ride in their own column; metadata-only queries never touch
  them (parquet column pruning — verified in tests via ReadSchema);
* decode/feature-extract runs in ``mapInPandas`` so one Arrow batch amortizes
  library setup, with ``maxRecordsPerBatch`` bounding memory per task;
* frame-sampling / resize emit one row per artifact (explode AFTER the heavy
  decode, not before, so the binary is deserialized once).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ]
)

_DECODERS: dict[str, object] = {}


def register_decoder(kind: str, fn) -> None:
    """Plug in a real decoder: fn(payload: bytes) -> np.ndarray feature."""
    _DECODERS[kind] = fn


def byte_bucket_fold_counts(payload: bytes, dim: int = 16) -> np.ndarray:
    """Raw folded byte-histogram counts: bucket b = #bytes with value//(256//dim)
    == b.  Integer-valued (exact in float32 below 2^24), so a SQL oracle can
    reproduce it bit-for-bit — this is the un-normalized core of
    :func:`_fake_feature` and the value gate for the mapInPandas decode path."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    hist = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256).astype(np.float64)
    return hist.reshape(dim, 256 // dim).sum(axis=1).astype(np.float32)


def _fake_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature: byte-histogram folded to `dim` buckets,
    L2-normalized.  Replace via register_decoder when PIL/librosa exist.

    STUB: not a real decode — the distributed plumbing around it is the
    deliverable here."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    hist = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256).astype(np.float64)
    folded = hist.reshape(dim, 256 // dim).sum(axis=1)
    norm = np.linalg.norm(folded)
    return (folded / norm if norm else folded).astype(np.float32)


# --- real decode path: netpbm images (PGM P2/P5, PPM P3/P6) ------------------------
# The heavyweight formats (JPEG/PNG/audio/video) stay stubbed — their codecs
# aren't in this container — but netpbm is a pure header+raster format, so this
# decoder is REAL: numpy-only, covering ascii and binary variants, comments,
# 8- and 16-bit samples.  It exercises the exact decode→feature contract a
# PIL/ffmpeg decoder would plug into via register_decoder.


def decode_netpbm(payload: bytes) -> np.ndarray:
    """bytes → float32 image in [0,1]: HxW (gray P2/P5) or HxWx3 (RGB P3/P6)."""

    def token(pos: int) -> tuple[bytes, int]:
        while pos < len(payload):
            c = payload[pos : pos + 1]
            if c == b"#":
                while pos < len(payload) and payload[pos : pos + 1] not in (b"\n", b"\r"):
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        return payload[start:pos], pos

    magic, pos = token(0)
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ValueError(f"not a netpbm payload: {magic!r}")
    w_b, pos = token(pos)
    h_b, pos = token(pos)
    max_b, pos = token(pos)
    w, h, maxval = int(w_b), int(h_b), int(max_b)
    channels = 3 if magic in (b"P3", b"P6") else 1
    n = w * h * channels
    if magic in (b"P2", b"P3"):  # ascii raster
        vals = np.array(payload[pos:].split()[:n], dtype=np.float64)
    else:  # binary raster: exactly ONE whitespace byte after maxval
        pos += 1
        dtype = ">u2" if maxval > 255 else np.uint8
        vals = np.frombuffer(payload, dtype=dtype, count=n, offset=pos).astype(np.float64)
    if vals.size != n:
        raise ValueError(f"raster truncated: {vals.size} of {n} samples")
    img = (vals / maxval).reshape((h, w) if channels == 1 else (h, w, 3))
    return img.astype(np.float32)


def netpbm_feature(payload: bytes) -> np.ndarray:
    """Image feature: [mean, std, 8-bin luminance histogram] (10-d float32)."""
    img = decode_netpbm(payload)
    gray = img if img.ndim == 2 else img.mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
    hist = hist.astype(np.float64) / max(gray.size, 1)
    return np.concatenate(([gray.mean()], [gray.std()], hist)).astype(np.float32)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index striding (the numpy-only stand-in for
    a real resampler; same shape contract)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def enable_netpbm_decoder() -> None:
    """Route kind='image' through the real netpbm decode."""
    register_decoder("image", netpbm_feature)


def extract_features(
    df: DataFrame, batch_dim: int = 16, decoders: dict | None = None
) -> DataFrame:
    """Decode + featurize media rows (mapInPandas; one Arrow batch per call).

    `decoders` overrides the module registry per-call (an explicit dict ships
    in the task closure — deterministic regardless of worker-side import
    state); None uses :func:`register_decoder`'s registry."""
    table = _DECODERS if decoders is None else decoders

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                decoder = table.get(kind, lambda b: _fake_feature(b, batch_dim))
                b = bytes(payload) if payload is not None else b""
                feats.append(decoder(b).tolist())
                nbytes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": nbytes,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(gen, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame.  The 'frames' here
    are byte slices (STUB standing in for video keyframes); the row-explosion
    shape, 1→N schema, and batch memory profile are the real contract."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for j in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    ids.append(mid)
                    nos.append(j)
                    frames.append(b[j * every_n_bytes : (j + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.select("media_id", "payload").mapInPandas(gen, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# WAV (RIFF/PCM) audio — REAL decoder, numpy-only (the audio twin of the
# netpbm image arm: no audio library in the sandbox, but canonical PCM WAV
# is a trivially parseable container, so the decode is genuine, not a stub)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE container with 16-bit integer PCM samples.

    Returns ``(sample_rate, n_channels, samples)`` with samples shaped
    (n_frames, n_channels) int16.  Walks the chunk list properly (fmt may be
    followed by LIST/fact before data; chunks are word-aligned).  Raises
    ValueError on non-RIFF input or non-PCM-16 encodings — callers route
    other codecs through ``register_decoder`` plug-ins."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported encoding fmt={audio_format} bits={bits}")
    samples = np.frombuffer(
        data[: (len(data) // (2 * n_channels)) * 2 * n_channels], dtype="<i2"
    ).reshape(-1, n_channels)
    return sample_rate, n_channels, samples


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal canonical PCM-16 WAV writer (fixture/round-trip use).
    ``samples`` is (n_frames, n_channels) int16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def wav_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-clip audio statistics from REAL WAV decode: ``(id, sample_rate_i,
    n_channels_i, n_frames_l, sum_sq_l, n_zero_cross_l, duration_ms_i)``.

    All outputs are exact integers — ``sum_sq_l`` (Σ sample² over channel 0)
    instead of float RMS, zero crossings as a strict sign-change count — so
    the oracle can state them closed-form (derive rms = sqrt(sum_sq/n)
    downstream).  Undecodable payloads yield NULL stats (visible, not
    dropped — the ingest-error metric).

    100 TB shape: one ``mapInPandas`` stage (Arrow batches amortize numpy
    setup), narrow, binary column read once; metadata-only consumers prune
    the payload column at the parquet scan."""
    out_schema = (
        f"{id_col} string, sample_rate_i int, n_channels_i int,"
        " n_frames_l long, sum_sq_l long, n_zero_cross_l long,"
        " duration_ms_i int"
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rate, n_ch, samples = decode_wav(bytes(payload))
                    ch0 = samples[:, 0].astype(np.int64)
                    sum_sq = int((ch0 * ch0).sum())
                    sgn = np.sign(ch0)
                    nz = sgn[sgn != 0]
                    crossings = int((nz[1:] != nz[:-1]).sum()) if nz.size else 0
                    rows.append(
                        (
                            mid,
                            rate,
                            n_ch,
                            int(samples.shape[0]),
                            sum_sq,
                            crossings,
                            int(samples.shape[0] * 1000 // rate) if rate else None,
                        )
                    )
                except (ValueError, IndexError, TypeError, ZeroDivisionError):
                    # NULL payloads (fetch failures), zero-channel fmt chunks,
                    # truncated headers — all degrade to the NULL-stats row
                    # rather than failing the task.
                    rows.append((mid, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "sample_rate_i",
                    "n_channels_i",
                    "n_frames_l",
                    "sum_sq_l",
                    "n_zero_cross_l",
                    "duration_ms_i",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(_batches, out_schema)


_MAGIC_PREFIXES = [
    # (media_type, uppercase hex prefix of the payload's first bytes)
    ("netpbm_pgm", "5035"),          # 'P5'
    ("netpbm_ppm", "5036"),          # 'P6'
    ("riff_wav", "52494646"),        # 'RIFF' (container; WAVE checked below)
    ("pdf", "25504446"),             # '%PDF'
    ("zip", "504B0304"),             # PK\x03\x04 (incl. docx/xlsx/pptx)
    ("gzip", "1F8B"),
    ("png", "89504E47"),
    ("jpeg", "FFD8FF"),
]


def sniff_media_type(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append ``media_type`` classified from the payload's MAGIC BYTES —
    the dispatch front of the U4/U5 registries (route to netpbm/WAV/PDF/
    OOXML arms without trusting file suffixes, which crawled URLs lie
    about).  Pure JVM: one hex() of the first 8 bytes + a prefix CASE
    chain, fused with the scan — no python stage, no exchange.  RIFF
    payloads subdivide by the format tag at offset 8 ('WAVE' → riff_wav,
    else riff_other); everything unrecognized is 'unknown' (visible, never
    dropped).  First match wins, longest-prefix entries listed first
    within a shared leading byte."""
    head = F.upper(F.hex(F.substring(F.col(payload_col), 1, 12)))
    expr = F.lit("unknown")
    for media_type, prefix in reversed(_MAGIC_PREFIXES):
        cond = head.startswith(prefix)
        if media_type == "riff_wav":
            # bytes 9-12 are the RIFF format tag; 'WAVE' = 57415645
            cond_wav = cond & (F.substring(head, 17, 8) == "57415645")
            expr = F.when(
                cond & ~(F.substring(head, 17, 8) == "57415645"),
                F.lit("riff_other"),
            ).otherwise(expr)
            expr = F.when(cond_wav, F.lit("riff_wav")).otherwise(expr)
        else:
            expr = F.when(cond, F.lit(media_type)).otherwise(expr)
    return df.withColumn("media_type", expr)


# --- perceptual near-dup: difference hash over REAL decoded rasters -----------


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (the classic 9x8 dHash): grayscale (channel
    mean for RGB), nearest-resize to 8 rows x 9 cols, bit (r, c) = 1 iff
    px[r][c] < px[r][c+1], packed little-endian by (r*8 + c).  Returned as
    a SIGNED 64-bit int (two's complement fold) so it rides a Spark
    LongType column unchanged.

    Strict `<` on a netpbm decode is exact: the decoder divides distinct
    integers by one shared maxval, which preserves order bit-for-bit."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    g = resize_nearest(img, 8, 9)
    bits = (g[:, :-1] < g[:, 1:]).astype(np.uint64).ravel()
    v = int((bits << np.arange(64, dtype=np.uint64)).sum())
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, dhash) from netpbm image payloads — REAL decode path
    (:func:`decode_netpbm`), one Arrow batch per task amortizing setup;
    the binary column is deserialized exactly once per image.  Rows whose
    payload is NULL or empty (fetch failures are routine in crawled media
    tables) are SKIPPED — they have no raster to hash, and surfacing them
    is the ingest scan's job, not the near-dup path's."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (str(i), dhash64(decode_netpbm(bytes(p))))
                for i, p in zip(pdf[id_col], pdf[payload_col])
                if p is not None and len(p) > 0
            ]
            yield pd.DataFrame(out, columns=["id", "dhash"])

    return df.select(id_col, payload_col).mapInPandas(gen, "id string, dhash long")


def dhash_near_dup_pairs(
    sig: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """(id_a, id_b, hamming) for all signature pairs within ``max_hamming``
    bits — banded Hamming join over (id, dhash).  With ``max_hamming <
    bands`` the band join is EXACT, not approximate: a pair differing in at
    most bands−1 bits must agree on at least one band (pigeonhole), so
    every qualifying pair surfaces in some bucket.

    100 TB shape: one posexplode to `bands` fixed-width keys, ONE
    self-join carrying (id, dhash, band, bhash) only — the band-join
    discipline of the minhash/simhash paths (no K-way union fan-out);
    verify is a JVM xor+bit_count.  Band buckets of a skewed corpus (all-
    flat images hash alike) bound at bucket size², same as simhash."""
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs < bands={bands} for exact recall"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    bhashes = F.array(
        *[
            F.shiftrightunsigned(F.col("dhash"), b * width).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]
    )
    k = sig.select("id", "dhash", F.posexplode(bhashes).alias("band", "bhash"))
    a = k.select(
        F.col("id").alias("id_a"), F.col("dhash").alias("dh_a"), "band", "bhash"
    )
    b = k.select(
        F.col("id").alias("id_b"), F.col("dhash").alias("dh_b"), "band", "bhash"
    )
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        # dedup the up-to-`bands`x band-duplicated pairs BEFORE the verify
        # (dh_a/dh_b are functionally determined by the ids)
        .select("id_a", "id_b", "dh_a", "dh_b")
        .distinct()
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("dh_a").bitwiseXOR(F.col("dh_b")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def spectral_peak_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_fft: int = 1024,
) -> DataFrame:
    """(id, sample_rate_i, peak_bin, peak_hz_mi): dominant-frequency
    detection from REAL WAV decode + rfft over the first ``n_fft`` frames
    of channel 0 — the frequency-domain sibling of the time-domain
    ``wav_audio_features`` panel (dedup/fingerprint pipelines key on
    spectral peaks, not RMS).

    Determinism discipline: ``peak_bin`` is an argmax over magnitudes with
    DC zeroed (numpy argmax takes the LOWEST bin on exact ties);
    ``peak_hz_mi`` is the bin's frequency in 1e-4 Hz as EXACT integer
    arithmetic ``bin * sr * 10000 // n_fft`` — a fixture whose tones sit on
    bin centers gets a closed-form oracle with no float anywhere.  Clips
    shorter than ``n_fft`` frames or undecodable yield NULL stats (visible,
    not dropped).

    100 TB shape: one narrow ``mapInPandas`` stage, Arrow-batched, binary
    read once; the FFT is O(n_fft log n_fft) per clip independent of clip
    length.
    """
    out_schema = (
        f"{id_col} string, sample_rate_i int, peak_bin int, peak_hz_mi long"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, _nch, samples = decode_wav(bytes(p))
                    x = samples[:n_fft, 0].astype(np.float64)
                    if x.shape[0] < n_fft:
                        raise ValueError("clip shorter than n_fft")
                    mag = np.abs(np.fft.rfft(x))
                    mag[0] = 0.0  # DC offset is not a tone
                    b = int(np.argmax(mag))
                    rows.append((str(i), sr, b, b * sr * 10000 // n_fft))
                except (ValueError, TypeError):
                    rows.append((str(i), None, None, None))
            out = pd.DataFrame(rows, columns=[id_col, "sample_rate_i", "peak_bin", "peak_hz_mi"])
            yield out

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)


def make_tone_clip(
    peak_bin: int,
    sample_rate: int = 8000,
    n_fft: int = 1024,
    amp: int = 9000,
    minor_bin: int | None = None,
) -> bytes:
    """Fixture tone: PCM-16 sine sitting EXACTLY on ``peak_bin``'s center
    (integer cycles over n_fft → zero spectral leakage → unambiguous
    argmax), optionally with a quarter-amplitude minor tone so "dominant"
    is actually exercised."""
    t = np.arange(n_fft, dtype=np.float64)
    x = amp * np.sin(2.0 * np.pi * peak_bin * t / n_fft)
    if minor_bin is not None and minor_bin != peak_bin:
        x = x + (amp / 4.0) * np.sin(2.0 * np.pi * minor_bin * t / n_fft)
    return encode_wav(np.round(x).astype(np.int16), sample_rate)


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) video — REAL decoder, numpy-only (the video twin of the
# netpbm/WAV arms: no av/ffmpeg in the sandbox, but Y4M is a trivially
# parseable uncompressed container — text header + FRAME-delimited planar
# YUV — so frame parsing, chroma-stride accounting, and frame sampling are
# genuine, not stubs).
# ---------------------------------------------------------------------------


def decode_y4m(payload: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Parse a YUV4MPEG2 stream → ``(width, height, fps_num, fps_den,
    frames)`` with frames shaped (n_frames, h, w) uint8 — the LUMA planes
    only (chroma is parsed for its byte stride and skipped; a wrong stride
    would shear every subsequent frame, which the gates catch).

    Supported chroma taggings: C420* (2×2 subsampled, the Y4M default),
    C444, Cmono.  Raises ValueError on bad magic, missing dims, unsupported
    chroma, a malformed FRAME marker, or a truncated frame body.
    """
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", errors="strict")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    fps_num, fps_den = 25, 1
    chroma = "420"
    for tok in header.split()[1:]:
        tag, val = tok[0], tok[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "C":
            chroma = val
    if w <= 0 or h <= 0:
        raise ValueError("missing W/H in Y4M header")
    if chroma.startswith("420"):
        if w % 2 or h % 2:
            raise ValueError("C420 requires even dimensions")
        chroma_bytes = (w // 2) * (h // 2) * 2
    elif chroma == "mono":
        chroma_bytes = 0
    elif chroma.startswith("444"):
        chroma_bytes = w * h * 2
    else:
        raise ValueError(f"unsupported chroma {chroma!r}")
    frame_bytes = w * h + chroma_bytes
    pos = nl + 1
    frames = []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("missing FRAME marker")
        pos = fnl + 1
        if pos + frame_bytes > len(payload):
            raise ValueError("truncated frame body")
        y = np.frombuffer(payload[pos : pos + w * h], dtype=np.uint8).reshape(h, w)
        frames.append(y)
        pos += frame_bytes
    stacked = np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)
    return w, h, fps_num, fps_den, stacked


def encode_y4m(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    chroma: str = "420",
) -> bytes:
    """Write (n, h, w) uint8 luma planes as a real Y4M stream; C420 emits
    constant-gray chroma planes (the decoder must skip EXACTLY these bytes
    or later frames corrupt — that stride is what the fixture exercises)."""
    n, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n".encode()]
    if chroma == "420":
        uv = bytes([128]) * ((w // 2) * (h // 2) * 2)
    elif chroma == "mono":
        uv = b""
    else:
        raise ValueError(f"encoder supports 420/mono, not {chroma!r}")
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames[f].tobytes())
        out.append(uv)
    return b"".join(out)


def video_frame_stats(
    df: DataFrame,
    every_k: int = 3,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, frame_idx, width, height, fps_num, y_sum, y_mean_mi): decode a
    Y4M payload, SAMPLE every ``every_k``-th frame (keyframe-stride
    sampling — the standard first pass of any video curation pipeline:
    stats/embeddings run on the sample, never the full frame stream), and
    emit exact-integer luma stats per sampled frame: ``y_sum`` = Σ of the
    Y plane, ``y_mean_mi`` = mean in 1e-4 units via integer division
    ``y_sum * 10000 // (w*h)`` — no float anywhere, so a closed-form
    gradient fixture gets an exact arithmetic oracle.  Undecodable or
    empty clips yield ONE all-NULL-stats row (visible, not dropped).

    100 TB shape: one narrow ``mapInPandas`` stage; the binary is
    deserialized once per clip and the explode happens AFTER the decode;
    cost scales with sampled frames, not clip length, for the stats step.
    """
    out_schema = (
        f"{id_col} string, frame_idx int, width int, height int,"
        " fps_num int, y_sum long, y_mean_mi long"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "frame_idx", "width", "height", "fps_num", "y_sum", "y_mean_mi"]
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if p is None:
                        raise ValueError("NULL payload")
                    w, h, fn, _fd, frames = decode_y4m(bytes(p))
                    if frames.shape[0] == 0:
                        raise ValueError("no frames")
                    for idx in range(0, frames.shape[0], every_k):
                        s = int(frames[idx].sum(dtype=np.int64))
                        rows.append((str(i), idx, w, h, fn, s, s * 10000 // (w * h)))
                except (ValueError, UnicodeDecodeError):
                    rows.append((str(i), None, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)


def make_gradient_video(i: int, chroma: str = "420") -> bytes:
    """Closed-form fixture clip ``i``: dims/frame-count/fps and every luma
    byte derive from arithmetic the DuckDB oracle re-derives —
    ``Y[f][r][c] = (i*11 + f*7 + r*5 + c*3) % 251``."""
    w = 8 + (i % 3) * 4
    h = 6 + (i % 2) * 2
    n = 5 + i % 7
    f_idx = np.arange(n).reshape(n, 1, 1)
    r_idx = np.arange(h).reshape(1, h, 1)
    c_idx = np.arange(w).reshape(1, 1, w)
    y = ((i * 11 + f_idx * 7 + r_idx * 5 + c_idx * 3) % 251).astype(np.uint8)
    fps = (30000, 1001) if i % 2 else (25, 1)
    return encode_y4m(y, fps=fps, chroma=chroma)


def decode_bmp(payload: bytes) -> np.ndarray:
    """bytes → HxWx3 uint8 RGB from a real Windows BMP (BITMAPFILEHEADER +
    40-byte BITMAPINFOHEADER, 24bpp uncompressed).  Handles the two traps a
    fake decoder would skip: rows are PADDED to 4-byte multiples, and a
    POSITIVE height means bottom-up row order (negative = top-down).
    Pixel byte order on disk is BGR."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, w, h, planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: hdr={hdr_size} bpp={bpp} comp={comp}")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


BMP_STATS_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("mean_r_i", LongType()),
        StructField("mean_g_i", LongType()),
        StructField("mean_b_i", LongType()),
    ]
)


def _channel_stats(
    df: DataFrame, decode_fn, payload_col: str, id_col: str
) -> DataFrame:
    """Shared body of the per-format *_stats surfaces: decode each payload
    with ``decode_fn`` (bytes → HxWx3 uint8) and emit the integer channel
    statistics of :data:`BMP_STATS_SCHEMA`; means are exact
    ``sum·100 div n_px``.  mapInPandas batched (one python pool, Arrow
    in/out); the closed-form fixtures make every output an arithmetic
    consequence of (i, x, y), so each gate catches decode bugs as value
    mismatches, not crashes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_fn(bytes(payload))
                h, w = img.shape[:2]
                s = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
                n = h * w
                out.append(
                    {
                        "media_id": str(mid),
                        "width": w,
                        "height": h,
                        "n_px": n,
                        "sum_r": int(s[0]),
                        "sum_g": int(s[1]),
                        "sum_b": int(s[2]),
                        "mean_r_i": int(s[0]) * 100 // n,
                        "mean_g_i": int(s[1]) * 100 // n,
                        "mean_b_i": int(s[2]) * 100 // n,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in BMP_STATS_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        gen, BMP_STATS_SCHEMA
    )


def bmp_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Integer channel statistics off the REAL BMP decode (stride padding,
    bottom-up rows, BGR order) — see :func:`_channel_stats`."""
    return _channel_stats(df, decode_bmp, payload_col, id_col)


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24bpp bottom-up BMP bytes (fixture writer twin of
    decode_bmp — real header, real padding)."""
    import struct

    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    data = raster.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_tiff(payload: bytes) -> np.ndarray:
    """bytes → HxWx3 uint8 RGB from a baseline little-endian TIFF
    (uncompressed, chunky RGB, strip-organized).  The traps a fake decoder
    skips: IFD entries hold SMALL values INLINE in the 4-byte value slot
    (count·size ≤ 4) but larger arrays via OFFSET, and the image arrives
    as MULTIPLE strips of rows_per_strip rows that must be reassembled in
    tag order — wrong inline/offset handling or strip order shears rows.

    Supported: Compression=1, PhotometricInterpretation=2 (RGB),
    BitsPerSample=8×3, SamplesPerPixel=3.  Everything else raises."""
    import struct

    if payload[:4] != b"II*\x00":
        raise ValueError("not a little-endian TIFF payload")
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n_ent,) = struct.unpack_from("<H", payload, ifd_off)
    _SIZES = {1: 1, 3: 2, 4: 4}

    def read_values(typ: int, cnt: int, raw: bytes) -> list[int]:
        size = _SIZES[typ]
        src = raw if cnt * size <= 4 else payload[
            struct.unpack("<I", raw)[0] : struct.unpack("<I", raw)[0]
            + cnt * size
        ]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return list(struct.unpack_from(f"<{cnt}{fmt}", src, 0))

    tags: dict[int, list[int]] = {}
    for k in range(n_ent):
        tag, typ, cnt = struct.unpack_from("<HHI", payload, ifd_off + 2 + 12 * k)
        raw = payload[ifd_off + 2 + 12 * k + 8 : ifd_off + 2 + 12 * k + 12]
        if typ in _SIZES:
            tags[tag] = read_values(typ, cnt, raw)
    w, h = tags[256][0], tags[257][0]
    if tags.get(259, [1])[0] != 1 or tags.get(262, [2])[0] != 2:
        raise ValueError("unsupported TIFF compression/photometric")
    if tags.get(258, [8, 8, 8]) != [8, 8, 8] or tags.get(277, [3])[0] != 3:
        raise ValueError("unsupported TIFF sample layout")
    rows_per_strip = tags.get(278, [h])[0]
    offs, cnts = tags[273], tags[279]
    if len(offs) != len(cnts) or len(offs) != -(-h // rows_per_strip):
        raise ValueError("inconsistent TIFF strip table")
    buf = b"".join(payload[o : o + c] for o, c in zip(offs, cnts))
    if len(buf) != w * h * 3:
        raise ValueError("TIFF strip bytes do not cover the image")
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3).copy()


def encode_tiff(img: np.ndarray, rows_per_strip: int = 4) -> bytes:
    """HxWx3 uint8 RGB → baseline little-endian TIFF bytes, MULTI-STRIP
    (fixture-writer twin of decode_tiff — real IFD, real inline-vs-offset
    value placement, real strip table)."""
    import struct

    h, w = img.shape[:2]
    n_strips = -(-h // rows_per_strip)
    strips = [
        img[i * rows_per_strip : (i + 1) * rows_per_strip].tobytes()
        for i in range(n_strips)
    ]
    # layout: header(8) | IFD | bits(6) | offsets(4n) | counts(4n) | strips
    n_ent = 9
    ifd_off = 8
    ifd_size = 2 + 12 * n_ent + 4
    bits_off = ifd_off + ifd_size
    offs_off = bits_off + 6
    # single-strip offsets/counts live INLINE in the IFD value slots —
    # no tables are written, so no table space may be reserved
    table = 0 if n_strips == 1 else 4 * n_strips
    cnts_off = offs_off + table
    data_off = cnts_off + table
    strip_offs = []
    pos = data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)

    def ent(tag: int, typ: int, cnt: int, val: int) -> bytes:
        return struct.pack("<HHII", tag, typ, cnt, val)

    entries = [
        ent(256, 3, 1, w),
        ent(257, 3, 1, h),
        ent(258, 3, 3, bits_off),
        ent(259, 3, 1, 1),
        ent(262, 3, 1, 2),
        ent(273, 4, n_strips, strip_offs[0] if n_strips == 1 else offs_off),
        ent(277, 3, 1, 3),
        ent(278, 3, 1, rows_per_strip),
        ent(
            279,
            4,
            n_strips,
            len(strips[0]) if n_strips == 1 else cnts_off,
        ),
    ]
    out = [
        b"II*\x00",
        struct.pack("<I", ifd_off),
        struct.pack("<H", n_ent),
        b"".join(entries),
        struct.pack("<I", 0),  # next-IFD pointer
        struct.pack("<HHH", 8, 8, 8),
        b"" if n_strips == 1 else struct.pack(f"<{n_strips}I", *strip_offs),
        b"" if n_strips == 1 else struct.pack(
            f"<{n_strips}I", *[len(s) for s in strips]
        ),
        b"".join(strips),
    ]
    return b"".join(out)


def tiff_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Integer channel statistics off the REAL multi-strip TIFF decode
    (IFD inline-vs-offset slots, strip reassembly) — see :func:`_channel_stats`."""
    return _channel_stats(df, decode_tiff, payload_col, id_col)

def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    the linear estimate a + b − c, ties broken left → up → up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """bytes → HxWx3 uint8 RGB from a real PNG (8-bit truecolor,
    non-interlaced).  The traps a fake decoder skips: IDAT may arrive as
    MULTIPLE chunks that concatenate into ONE zlib stream (not one stream
    per chunk), every scanline is prefixed by a filter-type byte, and
    filters 1-4 (Sub/Up/Average/Paeth) reconstruct against ALREADY-
    RECONSTRUCTED neighbor bytes — filtering against raw bytes corrupts
    everything after the first non-zero filter row.  Chunk CRCs are
    verified (zlib.crc32 over type+data).

    Supported: bit depth 8, color type 2 (RGB), compression 0, filter 0,
    interlace 0.  Everything else raises."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = []
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError("unsupported PNG layout (need 8-bit RGB, no interlace)")
    raw = zlib.decompress(b"".join(idat))
    bpp, stride = 3, w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        cur = out[y]
        if ftype == 0:
            cur[:] = np.frombuffer(line, dtype=np.uint8)
        elif ftype == 2:
            cur[:] = (np.frombuffer(line, dtype=np.uint8).astype(np.int32) + prev) % 256
        elif ftype in (1, 3, 4):
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pred = _paeth(a, b, c)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out.reshape(h, w, 3).copy()


def encode_png(img: np.ndarray, filter_of_row=None, idat_piece: int = 64) -> bytes:
    """HxWx3 uint8 RGB → real PNG bytes (fixture-writer twin of
    decode_png): real chunk CRCs, per-row filter types (default cycles
    0→4 so every reconstruction path is live), and the zlib stream split
    across MULTIPLE small IDAT chunks to keep the concatenation path hot."""
    import struct
    import zlib

    h, w = img.shape[:2]
    bpp, stride = 3, w * 3
    flat = img.reshape(h, stride).astype(np.int32)
    pick = filter_of_row or (lambda y: y % 5)
    lines = []
    for y in range(h):
        ftype = pick(y)
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        enc = bytearray([ftype])
        for x in range(stride):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            pred = {
                0: 0,
                1: a,
                2: b,
                3: (a + b) // 2,
                4: _paeth(a, b, c),
            }[ftype]
            enc.append((int(cur[x]) - pred) % 256)
        lines.append(bytes(enc))
    z = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idats = [
        chunk(b"IDAT", z[i : i + idat_piece]) for i in range(0, len(z), idat_piece)
    ]
    return b"".join(
        [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr), *idats, chunk(b"IEND", b"")]
    )


def png_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Integer channel statistics off the REAL filtered-scanline PNG
    decode (multi-IDAT zlib, Sub/Up/Average/Paeth) — see :func:`_channel_stats`."""
    return _channel_stats(df, decode_png, payload_col, id_col)

def _lzw_encode_gif(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows the code width when the
    next code would not fit, resets at 4096 codes; LSB-first bit packing."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out_bits = []

    def emit(code: int, width: int) -> None:
        for b in range(width):
            out_bits.append((code >> b) & 1)

    def fresh():
        return {bytes([k]): k for k in range(1 << min_code_size)}

    table = fresh()
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    buf = b""
    for idx in indices:
        nxt = buf + bytes([int(idx)])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf], width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
        buf = bytes([int(idx)])
    if buf:
        emit(table[buf], width)
        # the decoder appends one table entry AFTER processing this final
        # code and re-checks its width (size+1 rule, which equals
        # next_code+1 here since the flush adds no encoder entry) — emit
        # END at the width the decoder will actually read it with, or a
        # stream whose last data code lands exactly on a 2^w boundary
        # desyncs END by one bit-width
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
    emit(end, width)
    by = bytearray()
    for k in range(0, len(out_bits), 8):
        v = 0
        for j, bit in enumerate(out_bits[k : k + 8]):
            v |= bit << j
        by.append(v)
    return bytes(by)


def _lzw_decode_gif(data: bytes, min_code_size: int, n_expected: int) -> list:
    """Inverse of :func:`_lzw_encode_gif`.  The traps: the code width
    grows when the NEXT table entry would overflow it (so the decoder's
    width schedule must track table size + 1), and the KwKwK case — a
    code equal to the not-yet-defined next entry decodes as prev +
    prev[0]."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    pos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            raise ValueError("GIF LZW stream truncated")
        v = 0
        for b in range(width):
            byte = data[(pos + b) >> 3]
            v |= ((byte >> ((pos + b) & 7)) & 1) << b
        pos += width
        return v

    table = [bytes([k]) for k in range(1 << min_code_size)] + [b"", b""]
    width = min_code_size + 1
    out = []
    prev = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([k]) for k in range(1 << min_code_size)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("GIF LZW bad code")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
        if len(table) + 1 > (1 << width) and width < 12:
            width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    return out[:n_expected]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """bytes → HxWx3 uint8 RGB from a real single-frame GIF (87a/89a,
    global color table).  Real-codec traps: the LZW code width grows on a
    table-size schedule the encoder and decoder must agree on, the KwKwK
    self-referential code, extension blocks that must be skipped by
    sub-block framing (not fixed lengths), and four-pass interlace row
    reordering."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("GIF without a global color table")
    gct_n = 2 << (flags & 0x07)
    gct = np.frombuffer(payload[pos : pos + 3 * gct_n], dtype=np.uint8).reshape(
        gct_n, 3
    )
    pos += 3 * gct_n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if iflags & 0x80:
                raise ValueError("GIF local color tables unsupported")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                n = payload[pos]
                data += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = _lzw_decode_gif(bytes(data), min_code, w * h)
            arr = np.array(idx, dtype=np.uint8).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                rows = []
                for start, step in _GIF_INTERLACE_PASSES:
                    rows.extend(range(start, h, step))
                de = np.empty_like(arr)
                de[rows] = arr
                arr = de
            return gct[arr]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image block")


def encode_gif(
    img_idx: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(HxW palette indices, Nx3 palette) → real single-frame GIF89a
    bytes: real LZW stream, sub-block framing, optional interlace, and a
    skippable comment extension so the decoder's extension walk is live."""
    import struct

    h, w = img_idx.shape
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    size_field = depth - 1
    out = [b"GIF89a", struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)]
    pal = np.zeros((2**depth, 3), dtype=np.uint8)
    pal[:n] = palette
    out.append(pal.tobytes())
    out.append(b"\x21\xfe\x07fixture\x00")  # comment extension, sub-block framed
    iflags = 0x40 if interlace else 0
    out.append(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, iflags))
    arr = img_idx
    if interlace:
        rows = []
        for start, step in _GIF_INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        arr = img_idx[rows]
    min_code = max(2, depth)
    z = _lzw_encode_gif(arr.reshape(-1).tolist(), min_code)
    out.append(bytes([min_code]))
    for k in range(0, len(z), 255):
        piece = z[k : k + 255]
        out.append(bytes([len(piece)]) + piece)
    out.append(b"\x00\x3b")
    return b"".join(out)


def gif_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Integer channel statistics off the REAL GIF LZW decode (width
    schedule, KwKwK, interlace) — see :func:`_channel_stats`."""
    return _channel_stats(df, decode_gif, payload_col, id_col)

