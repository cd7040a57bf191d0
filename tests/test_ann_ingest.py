"""Incremental IVF index ingestion: streamed index == batch ivf_store
build, serving parity (pruned PartitionFilters survive streaming +
compaction), effectively-once replay, restart continuation."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from gtfs_osm_sync_spark.operators import similarity as SIM
from gtfs_osm_sync_spark.sources.snaptable import SnapTable
from gtfs_osm_sync_spark.streaming.ann_ingest import stream_ivf_ingest

SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _stage(emb, stage_dir, n_drops=3, mod=None):
    """Stage drops i in range(n_drops) of a `mod`-way split (mod defaults
    to n_drops; pass mod>n_drops to hold later drops back for a restart)."""
    mod = mod or n_drops
    per = [emb.filter(F.col("vec_id") % mod == i) for i in range(n_drops)]
    for i, b in enumerate(per):
        b.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(stage_dir, f"d{i}.parquet")
        )
    # the file source reads the directory recursively; stage flat files
    for i in range(n_drops):
        src = glob.glob(os.path.join(stage_dir, f"d{i}.parquet", "*.parquet"))[0]
        os.replace(src, os.path.join(stage_dir, f"drop{i}.parquet"))
        import shutil

        shutil.rmtree(os.path.join(stage_dir, f"d{i}.parquet"))


def _key(df):
    return sorted(
        (int(r["vec_id"]), int(r["list_id"])) for r in df.collect()
    )


def test_streamed_index_equals_batch_build(spark, emb, tmp_path):
    """Drain a 3-drop stream; the resulting index must hold exactly the
    batch ivf_store assignment (ivf_assign_bcast ties == literal fold,
    already pinned in test_similarity), and ivf_topk_stored must serve
    identical results with its In(list_id) PartitionFilters intact —
    including after the maybe_compact cadence rewrote the base."""
    cents = SIM.kmeans_centroids(emb, n_lists=8, iters=2)
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    _stage(emb, stage, n_drops=3)

    walls = []
    idx = stream_ivf_ingest(
        spark,
        stage,
        str(tmp_path / "ivf"),
        cents,
        SCHEMA,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        compact_max_tail=1,  # force compactions during the run
        on_batch_done=walls.append,
    )
    assert len(walls) == 3  # one micro-batch per drop

    batch_store = SIM.ivf_store(emb, cents, str(tmp_path / "ivf_batch"))
    assert _key(idx.read(spark)) == _key(batch_store.read(spark))

    q = emb.filter(F.col("vec_id") < 3)
    got = SIM.ivf_topk_stored(spark, q, idx, cents, k=5, nprobe=2)
    want = SIM.ivf_topk_stored(spark, q, batch_store, cents, k=5, nprobe=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "list_id" in pf[0] and " IN (" in pf[0].split(
        "PartitionFilters"
    )[1].split("]")[0], "streamed index lost the serving layout"


def test_restart_continues_and_replay_skips(spark, emb, tmp_path):
    """Stop after 2 drops, add a 3rd, restart with the same checkpoint:
    the index ends complete with no duplicate vectors; a full re-run
    over the same checkpoint appends nothing (effectively-once)."""
    cents = SIM.kmeans_centroids(emb, n_lists=8, iters=2)
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    _stage(emb, stage, n_drops=2, mod=3)  # thirds 0 and 1; third 2 held back

    root, ckpt = str(tmp_path / "ivf"), str(tmp_path / "ckpt")
    idx = stream_ivf_ingest(
        spark, stage, root, cents, SCHEMA,
        checkpoint_dir=ckpt, max_files_per_trigger=1,
    )
    n_half = idx.read(spark).count()
    assert 0 < n_half < emb.count()

    # third drop arrives; restart from the same checkpoint
    extra = emb.filter(F.col("vec_id") % 3 == 2)
    extra.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "x.parquet"))
    src = glob.glob(str(tmp_path / "x.parquet" / "*.parquet"))[0]
    os.replace(src, os.path.join(stage, "drop2.parquet"))

    idx2 = stream_ivf_ingest(
        spark, stage, root, cents, SCHEMA,
        checkpoint_dir=ckpt, max_files_per_trigger=1,
    )
    final = idx2.read(spark)
    assert final.count() == emb.count()
    assert final.select("vec_id").distinct().count() == emb.count()

    v_before = idx2.current_version()
    idx3 = stream_ivf_ingest(  # nothing new: no batch fires, no append
        spark, stage, root, cents, SCHEMA,
        checkpoint_dir=ckpt, max_files_per_trigger=1,
    )
    assert idx3.current_version() == v_before
    assert idx3.read(spark).count() == emb.count()


def test_checkpoint_dir_required(spark, emb, tmp_path):
    cents = SIM.kmeans_centroids(emb, n_lists=4, iters=1)
    with pytest.raises(ValueError, match="checkpoint_dir"):
        stream_ivf_ingest(spark, str(tmp_path), str(tmp_path / "i"), cents, SCHEMA)
