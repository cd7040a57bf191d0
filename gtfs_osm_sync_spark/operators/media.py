"""Audio/video multimodal columns: opaque binary payloads + typed
metadata, with the Spark-side plumbing (schema, partitioning, Arrow
batch shape, UDF signatures) fully real and the codec layer stubbed.

Pattern (mirrors operators/images.py for the image modality): payloads
are BinaryType columns riding next to typed metadata (sample_rate /
duration / codec for audio; fps / n_frames / codec for video). All
compute is `mapInPandas` over pruned column sets — payload bytes cross
Arrow once per stage, metadata-only plans never touch them (column
pruning is asserted in tests).

Codec layer (round 5): WAV/PCM is a REAL first-class codec — stdlib
`wave` decode (8/16/32-bit PCM, multi-channel downmixed to mono) plus
an `encode_wav` writer, the audio twin of PNG in functions/codecs.py.
'pcmsynth'/'framesynth' remain the deterministic synthetic stand-ins
(seeded by the payload hash — stable across runs and engines), and
NotImplementedError is narrowed to genuinely external compressed codecs
(mp3/opus/flac/aac need ffmpeg/libsndfile, absent in this container);
swap `decode_audio`/`decode_video_frame` for soundfile/PyAV calls in a
full container and every operator here works unchanged.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _seed_of(data: bytes) -> int:
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


_WAV_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def wav_info(data: bytes) -> tuple[int, int, int, int]:
    """RIFF/WAVE header -> (sample_rate, n_frames, n_channels,
    sample_width_bytes) via stdlib `wave` — the metadata source of truth
    for codec='wav' rows (typed metadata columns are a cache of this)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        return w.getframerate(), w.getnframes(), w.getnchannels(), w.getsampwidth()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """-> (float32 mono samples in [-1, 1], sample_rate). Real decode of
    8-bit unsigned / 16-bit / 32-bit signed PCM; multi-channel is
    downmixed by channel mean (the standard mono fold)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        sr, nf, nch, sw = (
            w.getframerate(), w.getnframes(), w.getnchannels(), w.getsampwidth()
        )
        raw = w.readframes(nf)
    if sw not in _WAV_DTYPE:
        raise NotImplementedError(
            f"{sw * 8}-bit PCM: 24-bit packing needs manual unpack; "
            "8/16/32-bit are supported"
        )
    x = np.frombuffer(raw, dtype=_WAV_DTYPE[sw]).astype(np.float32)
    if sw == 1:
        x = (x - 128.0) / 128.0  # 8-bit WAV is unsigned, midpoint 128
    else:
        x = x / float(2 ** (8 * sw - 1))
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return x.astype(np.float32), sr


def encode_wav(samples: np.ndarray, sample_rate: int, sampwidth: int = 2) -> bytes:
    """float [-1, 1] mono -> WAV bytes (PCM, little-endian). The synth
    tables use this so the payload column carries REAL decodable WAV —
    the same bytes a `wave`/soundfile reader outside this repo accepts."""
    if sampwidth not in _WAV_DTYPE:
        raise NotImplementedError(f"{sampwidth * 8}-bit PCM write unsupported")
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if sampwidth == 1:
        pcm = np.round(x * 127.0 + 128.0).astype(np.uint8)
    else:
        scale = float(2 ** (8 * sampwidth - 1) - 1)
        pcm = np.round(x * scale).astype(_WAV_DTYPE[sampwidth])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_audio(data: bytes, codec: str, sample_rate: int, n_samples: int) -> np.ndarray:
    """-> float32 mono samples in [-1, 1]. 'wav' = real stdlib RIFF/PCM
    decode (see decode_wav); 'pcmsynth' = deterministic synthetic decode
    (payload-seeded); compressed codecs are stubbed."""
    if codec == "wav":
        return decode_wav(data)[0]
    if codec == "pcmsynth":
        rng = np.random.default_rng(_seed_of(data))
        # a seeded tone mix: deterministic, full-scale, cheap
        t = np.arange(n_samples, dtype=np.float64) / max(sample_rate, 1)
        f0 = 110.0 * (1 + rng.integers(0, 8))
        return (0.6 * np.sin(2 * np.pi * f0 * t) + 0.4 * rng.standard_normal(n_samples) * 0.1).astype(
            np.float32
        )
    raise NotImplementedError(
        f"codec {codec!r}: compressed-audio decode (mp3/opus/flac/aac) needs "
        "ffmpeg/libsndfile, absent in this container; 'wav' is the real "
        "stdlib path, 'pcmsynth' the deterministic stand-in"
    )


def decode_video_frame(data: bytes, codec: str, frame_idx: int, h: int, w: int) -> np.ndarray:
    """-> one uint8 RGB frame. 'framesynth' = deterministic synthetic
    decode seeded by (payload, frame index); real codecs are stubbed."""
    if codec == "framesynth":
        rng = np.random.default_rng(_seed_of(data) ^ frame_idx)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    raise NotImplementedError(
        f"codec {codec!r}: real video decode needs ffmpeg/PyAV, absent in "
        "this container; 'framesynth' is the deterministic stand-in"
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("clipped_pct", T.DoubleType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip loudness/quality features (the audio twin of
    images.decode_stats): decode -> RMS / peak / zero-crossing rate /
    clipping ratio. Input columns: (media_id, bytes, codec, sample_rate,
    n_samples); everything else in the frame is pruned out before Arrow.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # zip over raw columns, not iterrows (no per-row Series)
            for media_id, data, codec, sr, ns in zip(
                pdf["media_id"], pdf["bytes"], pdf["codec"], pdf["sample_rate"], pdf["n_samples"]
            ):
                if codec == "wav":
                    # the RIFF header is the source of truth for real WAV
                    # (metadata columns are a cache, not an input)
                    x, sr = decode_wav(data)
                else:
                    x = decode_audio(data, codec, int(sr), int(ns))
                out.append(
                    (
                        media_id,
                        round(len(x) / max(int(sr), 1), 6),
                        round(float(np.sqrt(np.mean(x * x))), 6),
                        round(float(np.abs(x).max(initial=0.0)), 6),
                        int(np.count_nonzero(np.diff(np.signbit(x)))),
                        round(float(np.mean(np.abs(x) > 0.99)), 6),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    cols = ["media_id", "bytes", "codec", "sample_rate", "n_samples"]
    return media.select(*cols).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Frame sampling: emit stats for every `every_n`-th frame (bounded by
    max_frames per clip) — one output row per sampled frame, the standard
    fan-out shape for video -> per-frame feature pipelines. Input columns:
    (media_id, bytes, codec, fps, n_frames, h, w)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, data, codec, n_frames, h, w in zip(
                pdf["media_id"], pdf["bytes"], pdf["codec"], pdf["n_frames"], pdf["h"], pdf["w"]
            ):
                idxs = list(range(0, int(n_frames), max(every_n, 1)))[:max_frames]
                for i in idxs:
                    fr = decode_video_frame(data, codec, i, int(h), int(w))
                    m = fr.reshape(-1, 3).mean(axis=0)
                    out.append(
                        (
                            media_id, i, fr.shape[0], fr.shape[1],
                            round(float(m[0]), 4), round(float(m[1]), 4), round(float(m[2]), 4),
                        )
                    )
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    cols = ["media_id", "bytes", "codec", "fps", "n_frames", "h", "w"]
    return media.select(*cols).mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def synth_audio_table(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic audio table (media_id, bytes, codec, sample_rate,
    n_samples): payload = the id's md5 — opaque bytes whose hash seeds the
    synthetic decode, same contract as real compressed audio."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": [f"aud{int(i):010d}" for i in ids],
                    "bytes": [hashlib.md5(f"aud{int(i)}".encode()).digest() * 4 for i in ids],
                    "codec": "pcmsynth",
                    "sample_rate": 16_000,
                    "n_samples": [16_000 + int(i) % 8_000 for i in ids],
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen,
        "media_id string, bytes binary, codec string, sample_rate int, n_samples int",
    )


def synth_wav_table(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic REAL-WAV audio table: each payload is a decodable
    RIFF/PCM-16 file (seeded tone, amplitude cycle planting clipped rows
    every 5th id) — the metadata columns mirror the header, and any
    `wave`/soundfile reader outside this repo accepts the bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                sr = 8_000
                ns = 4_000 + (i % 7) * 500
                t = np.arange(ns, dtype=np.float64) / sr
                f0 = 110.0 * (1 + i % 8)
                amp = 0.5 + (i % 5) * 0.15  # i%5==4 -> 1.1: clips
                data = encode_wav(amp * np.sin(2 * np.pi * f0 * t), sr)
                rows.append((f"wav{i:010d}", data, "wav", sr, ns))
            yield pd.DataFrame(
                rows, columns=["media_id", "bytes", "codec", "sample_rate", "n_samples"]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen,
        "media_id string, bytes binary, codec string, sample_rate int, n_samples int",
    )


def synth_video_table(spark, n: int, partitions: int = 8) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": [f"vid{int(i):010d}" for i in ids],
                    "bytes": [hashlib.md5(f"vid{int(i)}".encode()).digest() * 8 for i in ids],
                    "codec": "framesynth",
                    "fps": 24.0,
                    "n_frames": [48 + int(i) % 72 for i in ids],
                    "h": 36,
                    "w": 64,
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen,
        "media_id string, bytes binary, codec string, fps double, n_frames int, h int, w int",
    )
