"""SnapTable atomicity + flagship kill/resume contract (north_rule):
a run killed mid-job and resumed produces a table identical to an
uninterrupted run; rollback restores earlier snapshots exactly."""

import pandas as pd
import pytest

from gtfs_osm_sync_spark import pipeline, synth
from gtfs_osm_sync_spark.pipeline import InjectedFailure
from gtfs_osm_sync_spark.sources.snaptable import SnapTable

N = 600


def _table_pdf(spark, root):
    t = SnapTable(root)
    return (
        t.read(spark)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def test_kill_and_resume_identical(spark, tmp_path):
    ref_root = str(tmp_path / "ref")
    res_root = str(tmp_path / "res")

    # uninterrupted reference run
    r1 = pipeline.run_flagship(spark, N, ref_root, run_id="r", n_chunks=4)
    assert r1.chunks_run == [0, 1, 2, 3]

    # killed after 2 committed chunks
    with pytest.raises(InjectedFailure):
        pipeline.run_flagship(
            spark, N, res_root, run_id="r", n_chunks=4, fail_after_chunks=2
        )
    t = SnapTable(res_root)
    assert t.processed_chunks("r") == {0, 1}

    # resume skips committed chunks, finishes the rest
    r2 = pipeline.run_flagship(spark, N, res_root, run_id="r", n_chunks=4)
    assert r2.chunks_skipped == [0, 1]
    assert r2.chunks_run == [2, 3]

    a = _table_pdf(spark, ref_root)
    b = _table_pdf(spark, res_root)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) == N


def test_checkpoint_metrics_recorded(spark, tmp_path):
    root = str(tmp_path / "m")
    pipeline.run_flagship(spark, 200, root, run_id="m", n_chunks=2)
    metrics = SnapTable(root).checkpoint_metrics("m")
    assert len(metrics) == 2
    for m in metrics:
        assert m["rows_out"] == m["rows_in"] and m["wall_ms"] >= 0
        assert m["id_range"][1] - m["id_range"][0] == m["rows_in"]


def test_snapshot_rollback(spark, tmp_path):
    root = str(tmp_path / "rb")
    t = SnapTable(root)
    df1 = synth.generate_images(spark, 50).select("image_id", "phash")
    v1 = t.append(df1)
    df2 = synth.generate_images(spark, 80, start=50).select("image_id", "phash")
    t.append(df2)
    assert t.read(spark).count() == 80
    t.rollback(v1)
    assert t.read(spark).count() == 50
    # history preserved: 3 snapshots (append, append, rollback)
    ops = [s.operation for s in t.snapshots()]
    assert ops == ["append", "append", "rollback"]


def test_every_category_present_in_flagship_output(spark, tmp_path):
    root = str(tmp_path / "cat")
    pipeline.run_flagship(spark, 2000, root, run_id="c", n_chunks=2)
    pdf = SnapTable(root).read(spark).toPandas()
    cats = set(pdf["category"].unique())
    assert {"UPLOAD_NO_CONFLICT", "UPLOAD_CONFLICT"} <= cats
    # nearest assignment only exists when a feature is in range
    has_near = pdf["nearest_feature_id"].notna()
    assert (pdf.loc[has_near, "nearest_dist_m"] < 400.0).all()
