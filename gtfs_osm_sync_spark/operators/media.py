"""Audio/video multimodal columns: opaque binary payloads + typed
metadata, with the Spark-side plumbing (schema, partitioning, Arrow
batch shape, UDF signatures) fully real and the codec layer stubbed.

Pattern (mirrors operators/images.py for the image modality): payloads
are BinaryType columns riding next to typed metadata (sample_rate /
duration / codec for audio; fps / n_frames / codec for video). All
compute is `mapInPandas` over pruned column sets — payload bytes cross
Arrow once per stage, metadata-only plans never touch them (column
pruning is asserted in tests).

Codec layer (round 5): WAV/PCM audio and RIFF/AVI video are REAL
first-class codecs — stdlib `wave` decode (8/16/32-bit PCM,
multi-channel downmixed to mono) plus an `encode_wav` writer, and a
Motion-PNG-in-AVI container (`encode_avi`/`avi_info`/
`decode_avi_frames`: real RIFF grammar, avih/strh/strf headers, idx1
seek index, PNG frame payloads via functions/codecs.py).
'pcmsynth'/'framesynth' remain the deterministic synthetic stand-ins
(seeded by the payload hash — stable across runs and engines), and
NotImplementedError is narrowed to genuinely external compressed codecs
(mp3/opus/flac/aac audio; h264/vp9/av1 video — need ffmpeg/PyAV,
absent in this container); swap `decode_audio`/`decode_avi_frames` for
soundfile/PyAV calls in a full container and every operator here works
unchanged.
"""

from __future__ import annotations

import hashlib
import io
import struct
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
    """-> one uint8 RGB frame. 'avi' = real RIFF/AVI container parse +
    PNG frame decode (see encode_avi/decode_avi_frames); 'framesynth' =
    deterministic synthetic decode seeded by (payload, frame index);
    inter-frame-compressed codecs are stubbed."""
    if codec == "avi":
        return decode_avi_frames(data, [frame_idx])[0]
    if codec == "framesynth":
        rng = np.random.default_rng(_seed_of(data) ^ frame_idx)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    raise NotImplementedError(
        f"codec {codec!r}: inter-frame video decode (h264/vp9/av1) needs "
        "ffmpeg/PyAV, absent in this container; 'avi' (Motion-PNG in a real "
        "RIFF/AVI shell) is the real path, 'framesynth' the deterministic "
        "stand-in"
    )


# ---- RIFF/AVI video container: Motion-PNG in a real AVI shell ----------
#
# The video twin of the WAV path above: a REAL container format, not a
# seeded fake. encode_avi writes a standards-shaped AVI — RIFF('AVI ')
# with LIST hdrl (avih main header + LIST strl [strh 'vids'/'MPNG' +
# strf BITMAPINFOHEADER]), LIST movi of '00dc' frame chunks, and an
# idx1 index — whose frame payloads are the repo's own PNG codec
# (functions/codecs.py png_encode), so any RIFF walker parses the shell
# and any PNG reader decodes the frames. Inter-frame codecs (h264 etc.)
# stay behind NotImplementedError; swapping decode_avi_frames for a
# PyAV call changes nothing upstream.

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd payloads get a pad byte that is
    # NOT counted in the stored size
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _riff_list(list_type: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + payload)


def encode_avi(frames: list[np.ndarray], fps: float) -> bytes:
    """uint8 (h, w, 3) frames -> AVI bytes (Motion-PNG '00dc' chunks,
    avih/strh/strf headers carrying real fps/frame-count/geometry, idx1
    keyframe index). All frames must share one geometry."""
    from ..functions.codecs import png_encode

    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = []
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share one geometry")
        payloads.append(png_encode(fr))
    max_bytes = max(len(p) for p in payloads)
    scale, rate = 1000, int(round(fps * 1000))
    avih = struct.pack(
        "<14I",
        int(round(1_000_000 / fps)),  # dwMicroSecPerFrame
        int(max_bytes * fps),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4s10I4h",
        b"vids", b"MPNG",
        0, 0, 0,  # dwFlags, wPriority|wLanguage, dwInitialFrames
        scale, rate,  # fps = dwRate / dwScale
        0, len(frames), max_bytes,  # dwStart, dwLength, dwSuggestedBufferSize
        0xFFFFFFFF, 0,  # dwQuality (default), dwSampleSize
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MPNG", h * w * 3, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    # idx1 offsets point at each chunk's ckid, relative to the 'movi'
    # fourcc position (the common convention AVI readers expect)
    movi_body, idx_entries, off = b"", [], 4
    for p in payloads:
        ck = _riff_chunk(b"00dc", p)
        idx_entries.append(struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, off, len(p)))
        movi_body += ck
        off += len(ck)
    movi = _riff_list(b"movi", movi_body)
    idx1 = _riff_chunk(b"idx1", b"".join(idx_entries))
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_riff(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [start, end) — the generic word-aligned RIFF walk."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def _avi_toplevel(data: bytes):
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    return _walk_riff(data, 12, min(8 + riff_size, len(data)))


def avi_info(data: bytes) -> tuple[float, int, int, int]:
    """AVI header -> (fps, n_frames, w, h) from the avih main header —
    the metadata source of truth for codec='avi' rows, the video twin of
    wav_info (typed metadata columns are a cache of this)."""
    fps = nf = w = h = None
    for fourcc, ps, sz in _avi_toplevel(data):
        if fourcc == b"LIST" and data[ps : ps + 4] == b"hdrl":
            for cc2, ps2, sz2 in _walk_riff(data, ps + 4, ps + sz):
                if cc2 == b"avih":
                    v = struct.unpack_from("<14I", data, ps2)
                    # dwMicroSecPerFrame may legally be 0 (strh is then
                    # the only rate source); `is None` not truthiness —
                    # a real 0.0 fps must not read as unset
                    if fps is None and v[0]:
                        fps = 1_000_000 / v[0]
                    nf, w, h = v[4], v[8], v[9]
                elif cc2 == b"LIST" and data[ps2 : ps2 + 4] == b"strl":
                    for cc3, ps3, _ in _walk_riff(data, ps2 + 4, ps2 + sz2):
                        if cc3 == b"strh" and data[ps3 : ps3 + 4] == b"vids":
                            _, _, _, _, _, scale, rate = struct.unpack_from(
                                "<4s4s5I", data, ps3
                            )
                            if scale:
                                fps = rate / scale  # exact; avih usec/frame is rounded
    if nf is None:
        raise ValueError("no avih header in AVI payload")
    if fps is None:
        raise ValueError("AVI payload carries no frame rate (avih and strh both zero)")
    return fps, nf, w, h


def decode_avi_frames(data: bytes, idxs: list[int]) -> list[np.ndarray]:
    """Decode the frames at `idxs` (0-based) -> uint8 (h, w, 3) each.
    Seeks via the idx1 index when present (O(requested frames), no full
    scan); falls back to a sequential movi walk for index-less files."""
    from ..functions.codecs import png_decode

    movi_pos, entries = None, None
    for fourcc, ps, sz in _avi_toplevel(data):
        if fourcc == b"LIST" and data[ps : ps + 4] == b"movi":
            movi_pos = ps  # offset of the 'movi' fourcc
            movi_end = ps + sz
        elif fourcc == b"idx1":
            entries = [
                struct.unpack_from("<4sIII", data, ps + 16 * i)
                for i in range(sz // 16)
            ]
    if movi_pos is None:
        raise ValueError("no movi list in AVI payload")
    if entries is not None:
        # only video-frame entries index frames: a multi-stream file's
        # idx1 interleaves audio ('01wb') and other ckids
        chunks = [(off, size) for ckid, _fl, off, size in entries if ckid == b"00dc"]
        # idx1 offsets are movi-relative by convention but some writers
        # emit absolute file offsets; detect by checking which base makes
        # the first entry's offset land on its own ckid
        base = movi_pos
        if chunks:
            off0, _ = chunks[0]
            if (
                data[movi_pos + off0 : movi_pos + off0 + 4] != b"00dc"
                and data[off0 : off0 + 4] == b"00dc"
            ):
                base = 0
        locs = [(base + off + 8, size) for off, size in chunks]
    else:
        locs = [
            (ps, sz)
            for cc, ps, sz in _walk_riff(data, movi_pos + 4, movi_end)
            if cc == b"00dc"
        ]
    return [png_decode(data[s : s + n]) for i in idxs for s, n in (locs[i],)]


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
                if codec == "avi":
                    # the avih header is the source of truth for real AVI
                    # (metadata columns are a cache, not an input) — and
                    # one container parse serves all sampled frames
                    _, n_frames, _, _ = avi_info(data)
                    idxs = list(range(0, int(n_frames), max(every_n, 1)))[:max_frames]
                    frames = decode_avi_frames(data, idxs)
                else:
                    idxs = list(range(0, int(n_frames), max(every_n, 1)))[:max_frames]
                    frames = [
                        decode_video_frame(data, codec, i, int(h), int(w)) for i in idxs
                    ]
                for i, fr in zip(idxs, frames):
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


def synth_avi_table(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic REAL-AVI video table: each payload is a parseable
    RIFF/AVI file (Motion-PNG frames at 24x16, 12 fps, 6..10 frames, a
    per-id colour ramp) whose metadata columns mirror the avih header.
    Every id % 4 == 0 plants a SCENE CUT: frames from the midpoint on
    are colour-inverted, so shot-boundary detection has a known answer
    (exactly 25% of clips cut; ramp-only inter-frame brightness deltas
    stay at 2, the inversion jumps >=74)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        h, w = 16, 24
        yy, xx = np.indices((h, w))
        base = ((yy * 7 + xx * 3) % 64).astype(np.int32)  # static texture
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                nf = 6 + i % 5
                frames = []
                for f in range(nf):
                    # per-id hue + per-frame brightness ramp
                    # hue bounded % 50 so mid-clip brightness stays in
                    # [37.5, 90.5]: the inversion's brightness jump is then
                    # >= 74 while the ramp's is 2 — both far from the
                    # default cut threshold (60), so detection can't flip
                    # on float jitter
                    fr = np.stack(
                        [
                            base + (i * 37) % 50 + f * 2,
                            base + (i * 59) % 50 + f * 2,
                            base + (i * 83) % 50 + f * 2,
                        ],
                        axis=-1,
                    )
                    fr = np.clip(fr, 0, 255).astype(np.uint8)
                    if i % 4 == 0 and f >= nf // 2:
                        fr = 255 - fr  # the planted scene cut
                    frames.append(fr)
                rows.append((f"avi{i:010d}", encode_avi(frames, 12.0), "avi", 12.0, nf, h, w))
            yield pd.DataFrame(
                rows, columns=["media_id", "bytes", "codec", "fps", "n_frames", "h", "w"]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen,
        "media_id string, bytes binary, codec string, fps double, n_frames int, h int, w int",
    )


def shot_boundaries(media: DataFrame, threshold: float = 60.0) -> DataFrame:
    """Shot-boundary detection: sample every frame, take the per-clip max
    inter-frame mean-brightness delta (the classic intensity-difference
    cut detector), flag clips whose max delta exceeds `threshold`.
    -> (media_id, n_frames, max_delta, has_cut). The window is
    partitioned per clip (bounded frames-per-clip), so the plan is one
    shuffle on media_id regardless of corpus size."""
    from pyspark.sql import Window

    frames = sample_frames(media, every_n=1, max_frames=1 << 30)
    bright = frames.withColumn(
        "brightness", (F.col("mean_r") + F.col("mean_g") + F.col("mean_b")) / 3.0
    )
    win = Window.partitionBy("media_id").orderBy("frame_idx")
    deltas = bright.withColumn(
        "delta", F.abs(F.col("brightness") - F.lag("brightness").over(win))
    )
    return deltas.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.round(F.max(F.coalesce("delta", F.lit(0.0))), 4).alias("max_delta"),
        (F.max(F.coalesce("delta", F.lit(0.0))) > threshold).alias("has_cut"),
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
