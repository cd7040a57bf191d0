"""Audio/video multimodal plumbing: schemas, determinism, fan-out shape,
payload column pruning, and honest NotImplementedError codec guards."""

from __future__ import annotations

import pytest

from gtfs_osm_sync_spark.operators import media as M

N = 300


def test_audio_features_deterministic(spark):
    a = M.synth_audio_table(spark, N, partitions=4)
    f1 = {r["media_id"]: r.asDict() for r in M.audio_features(a).collect()}
    f2 = {r["media_id"]: r.asDict() for r in M.audio_features(a).collect()}
    assert f1 == f2 and len(f1) == N
    s = f1["aud0000000007"]
    assert 0.0 < s["rms"] < 1.0 and s["peak"] <= 1.0
    assert s["zero_crossings"] > 0
    assert abs(s["duration_s"] - (16_000 + 7 % 8_000) / 16_000) < 1e-6


def test_frame_sampling_fanout(spark):
    v = M.synth_video_table(spark, 50, partitions=2)
    fr = M.sample_frames(v, every_n=10, max_frames=8)
    rows = fr.collect()
    # per clip: ceil(n_frames/10) capped at 8 sampled frames
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in per.items():
        i = int(mid[3:])
        n_frames = 48 + i % 72
        want = list(range(0, n_frames, 10))[:8]
        assert sorted(idxs) == want
    assert all(r["h"] == 36 and r["w"] == 64 for r in rows)
    assert all(0.0 <= r["mean_r"] <= 255.0 for r in rows)


def test_metadata_only_plan_prunes_payload(spark, tmp_path):
    """A metadata-only aggregation over a STORED media table must not
    read the binary payload column: the parquet scan's ReadSchema has to
    exclude `bytes` (column pruning is the whole point of keeping
    payloads as ordinary columns)."""
    path = str(tmp_path / "audio_tbl")
    M.synth_audio_table(spark, 100, partitions=2).write.parquet(path)
    tbl = spark.read.parquet(path)
    meta = tbl.groupBy("codec").count()
    phys = meta._jdf.queryExecution().executedPlan().toString()
    import re
    read_schema = re.search(r"ReadSchema: ([^\n]*)", phys)
    assert read_schema and "bytes" not in read_schema.group(1)
    assert meta.collect()[0]["count"] == 100


def test_unknown_codec_raises(spark):
    a = M.synth_audio_table(spark, 5, partitions=1).withColumn(
        "codec", __import__("pyspark.sql.functions", fromlist=["x"]).lit("opus")
    )
    with pytest.raises(Exception, match="NotImplementedError|opus"):
        M.audio_features(a).collect()


def test_wav_roundtrip_exact():
    """encode_wav -> decode_wav round-trips PCM-16 to quantization
    accuracy and reports the header sample rate."""
    import numpy as np

    sr = 8000
    t = np.arange(4000) / sr
    x = 0.7 * np.sin(2 * np.pi * 220.0 * t)
    data = M.encode_wav(x, sr)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    y, sr2 = M.decode_wav(data)
    assert sr2 == sr and len(y) == len(x)
    assert np.abs(y - x).max() < 1.5 / 32767
    assert M.wav_info(data) == (sr, 4000, 1, 2)


def test_wav_8bit_and_downmix():
    """8-bit unsigned PCM decodes to [-1, 1]; stereo payloads downmix by
    channel mean."""
    import io
    import wave

    import numpy as np

    x = 0.5 * np.sin(2 * np.pi * 110.0 * np.arange(2000) / 8000)
    y8, _ = M.decode_wav(M.encode_wav(x, 8000, sampwidth=1))
    assert np.abs(y8 - x).max() < 1.5 / 127  # 8-bit quantization floor
    # hand-built stereo: L = x, R = -x -> mono mean ~ 0
    pcm = np.round(np.stack([x, -x], axis=1).reshape(-1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    ym, _ = M.decode_wav(buf.getvalue())
    assert len(ym) == 2000 and np.abs(ym).max() < 1e-4


def test_wav_features_header_is_truth(spark):
    """audio_features on codec='wav' rows takes sample rate from the
    RIFF header, not the metadata column: a deliberately wrong
    sample_rate column must not change duration_s."""
    import pyspark.sql.functions as F

    tbl = M.synth_wav_table(spark, 10, partitions=2)
    feats_ok = {r["media_id"]: r["duration_s"]
                for r in M.audio_features(tbl).collect()}
    lied = tbl.withColumn("sample_rate", F.lit(1))
    feats_lied = {r["media_id"]: r["duration_s"]
                  for r in M.audio_features(lied).collect()}
    assert feats_ok == feats_lied
    # planted clipping: exactly the i%5==4 ids clip
    clipped = {r["media_id"] for r in M.audio_features(tbl).collect()
               if r["clipped_pct"] > 0}
    assert clipped == {f"wav{i:010d}" for i in range(10) if i % 5 == 4}


def test_wav_24bit_raises():
    import numpy as np

    with pytest.raises(NotImplementedError, match="24-bit"):
        M.encode_wav(np.zeros(10), 8000, sampwidth=3)


def _avi_frames(n=5, h=16, w=24, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_avi_roundtrip_exact():
    """encode_avi -> avi_info / decode_avi_frames round-trips losslessly
    (Motion-PNG frames) and the header carries exact fps/geometry."""
    import numpy as np

    frames = _avi_frames()
    data = M.encode_avi(frames, 12.0)
    assert M.avi_info(data) == (12.0, 5, 24, 16)
    dec = M.decode_avi_frames(data, [0, 2, 4])
    assert all(np.array_equal(d, frames[i]) for d, i in zip(dec, [0, 2, 4]))
    assert np.array_equal(M.decode_video_frame(data, "avi", 3, 16, 24), frames[3])


def test_avi_riff_grammar():
    """The container is structurally real RIFF/AVI: an independent chunk
    walk (not the module's parser) finds RIFF('AVI '), LIST hdrl with an
    avih whose fields match, LIST movi with one word-aligned '00dc' per
    frame, and an idx1 whose offsets land on those chunks."""
    import struct

    frames = _avi_frames(n=4)
    data = M.encode_avi(frames, 25.0)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", data, 4)
    assert 8 + riff_size == len(data)
    tops, pos = {}, 12
    while pos < len(data):
        cc = data[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        key = data[pos + 8 : pos + 12].decode() if cc == b"LIST" else cc.decode()
        tops[key] = (pos + 8, sz)
        pos += 8 + sz + (sz % 2)
    assert set(tops) == {"hdrl", "movi", "idx1"}
    hp, hsz = tops["hdrl"]
    assert data[hp + 4 : hp + 8] == b"avih"
    avih = struct.unpack_from("<14I", data, hp + 12)
    assert (avih[4], avih[8], avih[9]) == (4, 24, 16)  # frames, w, h
    mp, msz = tops["movi"]
    dc = []
    p = mp + 4
    while p < mp + msz:
        assert data[p : p + 4] == b"00dc"
        (csz,) = struct.unpack_from("<I", data, p + 4)
        assert data[p + 8 : p + 16] == b"\x89PNG\r\n\x1a\n"
        dc.append(p)
        p += 8 + csz + (csz % 2)
    assert len(dc) == 4
    ip, isz = tops["idx1"]
    assert isz == 4 * 16
    for i, chunk_pos in enumerate(dc):
        ckid, flags, off, _ = struct.unpack_from("<4sIII", data, ip + 16 * i)
        assert ckid == b"00dc" and flags == 0x10
        assert mp + off == chunk_pos  # offset relative to the 'movi' fourcc


def test_avi_indexless_fallback():
    """Files without idx1 decode via the sequential movi walk."""
    import struct

    import numpy as np

    frames = _avi_frames(n=3)
    data = M.encode_avi(frames, 10.0)
    cut = data.rfind(b"idx1")
    noidx = b"RIFF" + struct.pack("<I", cut - 8) + data[8:cut]
    dec = M.decode_avi_frames(noidx, [1, 2])
    assert np.array_equal(dec[0], frames[1]) and np.array_equal(dec[1], frames[2])


def test_avi_frame_sampling_header_is_truth(spark):
    """sample_frames on codec='avi' rows takes frame count/geometry from
    the avih header, not the metadata columns: deliberately wrong
    n_frames/h/w columns must not change the output."""
    import pyspark.sql.functions as F

    tbl = M.synth_avi_table(spark, 12, partitions=2)
    ok = sorted(map(tuple, M.sample_frames(tbl, every_n=1, max_frames=99).collect()))
    lied = (
        tbl.withColumn("n_frames", F.lit(1))
        .withColumn("h", F.lit(2))
        .withColumn("w", F.lit(2))
    )
    assert ok == sorted(
        map(tuple, M.sample_frames(lied, every_n=1, max_frames=99).collect())
    )
    per = {}
    for r in ok:
        per.setdefault(r[0], []).append(r[1])
    for mid, idxs in per.items():
        i = int(mid[3:])
        assert sorted(idxs) == list(range(6 + i % 5))


def test_shot_boundaries_single_shuffle(spark):
    """The cut detector's window (partitionBy media_id) and the per-clip
    groupBy(media_id) must share ONE Exchange: a second shuffle on the
    same key would double the network cost of the dominant stage at
    corpus scale."""
    plan = (
        M.shot_boundaries(M.synth_avi_table(spark, 8, partitions=2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(media_id") == 1


def test_avi_shot_boundaries(spark):
    """shot_boundaries flags exactly the planted i%4==0 scene cuts, with
    the designed margins (ramp delta 2, inversion delta >= 74)."""
    rows = {r["media_id"]: r for r in
            M.shot_boundaries(M.synth_avi_table(spark, 20, partitions=2)).collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        i = int(mid[3:])
        assert r["has_cut"] == (i % 4 == 0)
        assert r["n_frames"] == 6 + i % 5
        if i % 4 == 0:
            assert r["max_delta"] >= 74.0
        else:
            assert r["max_delta"] <= 2.01


def test_avi_multistream_absolute_idx1():
    """General-shell parsing (ADVICE r5): an idx1 that interleaves audio
    ('01wb') entries and uses ABSOLUTE file offsets (both legal per the
    AVI spec) must still seek the right video frames — entries are
    filtered to '00dc' and the offset base is auto-detected."""
    import struct

    import numpy as np

    frames = _avi_frames(n=4)
    data = M.encode_avi(frames, 12.0)
    # locate movi + the four '00dc' chunk positions (absolute)
    tops, pos = {}, 12
    while pos < len(data):
        cc = data[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        key = data[pos + 8 : pos + 12].decode() if cc == b"LIST" else cc.decode()
        tops[key] = (pos + 8, sz)
        pos += 8 + sz + (sz % 2)
    mp, msz = tops["movi"]
    dc, p = [], mp + 4
    while p < mp + msz:
        (csz,) = struct.unpack_from("<I", data, p + 4)
        dc.append((p, csz))
        p += 8 + csz + (csz % 2)
    # rebuild idx1: absolute offsets + interleaved fake audio entries
    body = b""
    for chunk_pos, csz in dc:
        body += struct.pack("<4sIII", b"01wb", 0, chunk_pos, 4)
        body += struct.pack("<4sIII", b"00dc", 0x10, chunk_pos, csz)
    cut = data.rfind(b"idx1")
    rebuilt = data[8:cut] + b"idx1" + struct.pack("<I", len(body)) + body
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt)) + rebuilt
    dec = M.decode_avi_frames(rebuilt, [0, 3])
    assert np.array_equal(dec[0], frames[0]) and np.array_equal(dec[1], frames[3])


def test_avi_info_fps_guards():
    """avih dwMicroSecPerFrame == 0 must not divide by zero: fps falls
    through to strh rate/scale; when strh scale is ALSO 0 the parser
    raises instead of returning None/garbage (ADVICE r5)."""
    import struct

    import pytest

    data = bytearray(M.encode_avi(_avi_frames(n=2), 10.0))
    avih_at = bytes(data).find(b"avih") + 8
    struct.pack_into("<I", data, avih_at, 0)  # dwMicroSecPerFrame = 0
    fps, nf, w, h = M.avi_info(bytes(data))
    assert (fps, nf, w, h) == (10.0, 2, 24, 16)  # strh rate/scale is exact
    strh_at = bytes(data).find(b"strh") + 8
    struct.pack_into("<I", data, strh_at + 20, 0)  # dwScale = 0
    with pytest.raises(ValueError, match="frame rate"):
        M.avi_info(bytes(data))
