"""Audio/video multimodal columns: opaque binary payloads + typed
metadata, with the Spark-side plumbing (schema, partitioning, Arrow
batch shape, UDF signatures) fully real and the codec layer stubbed.

Pattern (mirrors operators/images.py for the image modality): payloads
are BinaryType columns riding next to typed metadata (sample_rate /
duration / codec for audio; fps / n_frames / codec for video). All
compute is `mapInPandas` over pruned column sets — payload bytes cross
Arrow once per stage, metadata-only plans never touch them (column
pruning is asserted in tests).

Codec layer: this container has no libsndfile/ffmpeg, so `decode_audio`
and `decode_video_frame` use a DETERMINISTIC synthetic decoder for the
'pcmsynth'/'framesynth' codecs (seeded by the payload hash — stable
across runs and engines) and raise NotImplementedError for real codecs;
swap the two functions for soundfile/PyAV calls in a full container and
every operator here works unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _seed_of(data: bytes) -> int:
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


def decode_audio(data: bytes, codec: str, sample_rate: int, n_samples: int) -> np.ndarray:
    """-> float32 mono samples in [-1, 1]. 'pcmsynth' = deterministic
    synthetic decode (payload-seeded); real codecs are stubbed."""
    if codec == "pcmsynth":
        rng = np.random.default_rng(_seed_of(data))
        # a seeded tone mix: deterministic, full-scale, cheap
        t = np.arange(n_samples, dtype=np.float64) / max(sample_rate, 1)
        f0 = 110.0 * (1 + rng.integers(0, 8))
        return (0.6 * np.sin(2 * np.pi * f0 * t) + 0.4 * rng.standard_normal(n_samples) * 0.1).astype(
            np.float32
        )
    raise NotImplementedError(
        f"codec {codec!r}: real audio decode needs libsndfile/ffmpeg, absent "
        "in this container; 'pcmsynth' is the deterministic stand-in"
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
