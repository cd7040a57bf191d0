"""SnapTable atomicity + flagship kill/resume contract (north_rule):
a run killed mid-job and resumed produces a table identical to an
uninterrupted run; rollback restores earlier snapshots exactly."""

import pandas as pd
import pyspark.sql.functions as F
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


def test_partitioned_append_compact_read_split(spark, tmp_path):
    """Round-5 layout contract: partitioned appends land as immutable
    hive trees, compact() folds them into a BASE snapshot whose scan
    partition-prunes, read_split separates base from post-compaction
    tail, and rollback across the compaction restores the pre-compact
    file list exactly."""
    root = str(tmp_path / "pt")
    t = SnapTable(root, partition_by="p")
    df1 = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "id int, p int, v string")
    df2 = spark.createDataFrame([(3, 10, "c")], "id int, p int, v string")
    t.append(df1)
    v2 = t.append(df2)

    # re-open WITHOUT the arg: layout inherited from the manifest
    t2 = SnapTable(root)
    assert t2.partition_by == "p"
    assert sorted(tuple(r) for r in t2.read(spark).select("id", "p", "v").collect()) == [
        (1, 10, "a"), (2, 20, "b"), (3, 10, "c")
    ]
    base, tail = t2.read_split(spark)
    assert base is None and tail is not None  # nothing compacted yet

    t2.compact(spark)
    base, tail = t2.read_split(spark)
    assert base is not None and tail is None
    assert base.count() == 3
    # the base scan partition-prunes (PartitionFilters on p)
    plan = (
        base.filter(F.col("p") == 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "p" in line.split("PartitionFilters")[1].split("]")[0]

    # post-compaction appends are tail; full read sees everything
    t2.append(spark.createDataFrame([(4, 30, "d")], "id int, p int, v string"))
    base, tail = t2.read_split(spark)
    assert base.count() == 3 and tail.count() == 1
    assert t2.read(spark).count() == 4

    # rollback across the compaction: v2's exact file list restored
    t2.rollback(v2)
    assert t2.read(spark).count() == 3
    b, tl = t2.read_split(spark)
    assert b is None  # pre-compaction snapshot had no base


def test_partition_layout_guards(spark, tmp_path):
    """Mismatched partition columns and flat->partitioned flips on a
    non-empty table are refused at open time."""
    root = str(tmp_path / "g")
    t = SnapTable(root, partition_by="p")
    t.append(spark.createDataFrame([(1, 10)], "id int, p int"))
    with pytest.raises(ValueError, match="partitioned by"):
        SnapTable(root, partition_by="q")
    root2 = str(tmp_path / "flat")
    f = SnapTable(root2)
    f.append(spark.createDataFrame([(1, 10)], "id int, p int"))
    with pytest.raises(ValueError, match="flat"):
        SnapTable(root2, partition_by="p")


def test_compact_with_reducer_keeps_ledger(spark, tmp_path):
    """compact(reducer=...) folds history (latest row per key) while the
    checkpoint ledger — which rides the snapshot CHAIN, not the file
    list — still reports every processed chunk."""
    root = str(tmp_path / "cr")
    t = SnapTable(root)
    t.append(
        spark.createDataFrame([(1, 0, "old"), (2, 0, "x")], "k int, seq int, v string"),
        checkpoint={"run_id": "r", "chunks": [0]},
    )
    t.append(
        spark.createDataFrame([(1, 1, "new")], "k int, seq int, v string"),
        checkpoint={"run_id": "r", "chunks": [1]},
    )

    def latest(df):
        from pyspark.sql import functions as FF
        g = df.groupBy("k").agg(
            FF.max_by(FF.struct("seq", "v"), FF.col("seq")).alias("_r")
        )
        return g.select("k", "_r.*")

    t.compact(spark, reducer=latest)
    rows = sorted(tuple(r) for r in t.read(spark).collect())
    assert rows == [(1, 1, "new"), (2, 0, "x")]
    assert t.processed_chunks("r") == {0, 1}


def test_snaptable_iceberg_seam_contract():
    """The SnapTable->Iceberg swap seam (module docstring): the public
    surface the engine is allowed to touch is exactly the documented
    method set, and every method appears in the docstring's
    mechanism-by-mechanism mapping. pyiceberg is NOT installable in this
    sandbox (no network installs), so the seam is pinned structurally:
    a new public method without a documented Iceberg equivalent fails
    here, keeping the swap local to snaptable.py as designed."""
    import inspect

    from gtfs_osm_sync_spark.sources import snaptable as ST

    documented = {
        "append",        # df.writeTo(tbl).append() / manifest commit
        "compact",       # rewrite_data_files
        "read",          # spark.table / snapshot read
        "read_split",    # manifest-level partition-summary pruning
        "rollback",      # rollback_to_snapshot
        "snapshot",      # snapshot metadata
        "snapshots",     # table.snapshots metadata table
        "is_empty",
        "current_version",
        "processed_chunks",    # snapshot summary properties
        "checkpoint_metrics",  # snapshot summary properties
        "tail_entry_count",    # manifest-list entry count since rewrite
        "maybe_compact",       # scheduled rewrite_data_files maintenance
    }
    public = {
        n for n, m in inspect.getmembers(ST.SnapTable, inspect.isfunction)
        if not n.startswith("_")
    }
    assert public == documented, (
        f"SnapTable public surface drifted: +{public - documented} "
        f"-{documented - public}; update the Iceberg mapping in the "
        "module docstring AND this contract"
    )
    doc = ST.__doc__
    for word in ("rewrite_data_files", "metadata.json", "rollback_to_snapshot",
                 "VERSION AS OF", "remove_orphan_files", "manifest"):
        assert word in doc, f"Iceberg mapping lost from docstring: {word}"


def test_maybe_compact_cadence(spark, tmp_path):
    """maybe_compact is the bounded-read-cost contract (ADVICE r5): it
    no-ops under the threshold, compacts past it, and afterwards the
    tail restarts at zero with content unchanged — on a PARTITIONED
    table the read() union chain (one scan per append tree) is thereby
    kept O(max_tail)."""
    from gtfs_osm_sync_spark.sources.snaptable import SnapTable

    t = SnapTable(str(tmp_path / "t"), partition_by="p")
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr("id", "id % 3 as p")
    for i in range(4):
        t.append(mk(i * 10, i * 10 + 10))
    assert t.tail_entry_count() == 4
    assert t.maybe_compact(spark, max_tail=8) is None  # under threshold
    assert t.tail_entry_count() == 4
    v = t.maybe_compact(spark, max_tail=3)
    assert v is not None and t.tail_entry_count() == 0
    rows = sorted(r["id"] for r in t.read(spark).collect())
    assert rows == list(range(40))
    # subsequent appends count from the new base
    t.append(mk(40, 50))
    assert t.tail_entry_count() == 1
