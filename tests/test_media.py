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
