"""Incremental (streaming) image curation: per-batch decode + gates,
within-batch dedup, banded cross-batch fold against the accepted log,
first-wins canonical semantics, effectively-once replay."""

import pyspark.sql.functions as F

from gtfs_osm_sync_spark import synth
from gtfs_osm_sync_spark.functions.codecs import decode_image, dct_phash, luma
from gtfs_osm_sync_spark.sources.snaptable import SnapTable
from gtfs_osm_sync_spark.streaming import curation as SC

BRIGHT_LO, BRIGHT_HI = 112.0, 143.0


def _num(iid: str) -> int:
    return int(iid[3:])


def _world(spark, n=300):
    """3 batch files: batch0 = img[0,100); batch1 = img[100,200) +
    dup{0..90 step 10} (cross-batch plants of batch0 originals) +
    dup{100..190}; batch2 = img[200,300) + dup{200..290}."""
    allrows = synth.generate_images_with_dups(spark, n)
    num = F.substring("image_id", 4, 12).cast("long")
    is_dup = F.col("image_id").startswith("dup")
    b0 = allrows.filter(~is_dup & (num < 100))
    b1 = allrows.filter(
        (~is_dup & num.between(100, 199)) | (is_dup & (num < 200))
    )
    b2 = allrows.filter(num >= 200)
    return allrows, [b0, b1, b2]


def _expected(allrows_pdf):
    """Driver-side expectation: gate-passers, per-pair survivor under
    first-wins (earlier batch, then min id)."""
    feats = {}
    for _, r in allrows_pdf.iterrows():
        img = decode_image(r["bytes"], r["fmt"])
        g = luma(img)
        feats[r["image_id"]] = (round(float(g.mean()), 6), dct_phash(img))

    def batch_of(iid):
        n = _num(iid)
        if iid.startswith("img"):
            return 0 if n < 100 else (1 if n < 200 else 2)
        return 1 if n < 200 else 2

    ok = {i for i, (b, _) in feats.items() if BRIGHT_LO <= b <= BRIGHT_HI}
    survivors, folds = set(ok), {}
    for iid in sorted(ok):
        if not iid.startswith("dup"):
            continue
        other = "img" + iid[3:]
        if other not in ok:
            continue
        h = bin((feats[iid][1] ^ feats[other][1]) & (2**64 - 1)).count("1")
        if h > 3:
            continue
        pair = sorted([iid, other], key=lambda x: (batch_of(x), x))
        winner, loser = pair[0], pair[1]
        survivors.discard(loser)
        folds[loser] = winner
    return ok, survivors, folds


def test_stream_curation_first_wins_and_restart(spark, tmp_path):
    allrows, batches = _world(spark)
    src = tmp_path / "drops"
    src.mkdir()
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}.parquet"))
    schema = synth.IMAGES_SCHEMA

    SC.stream_curate_images(
        spark, str(src / "*"), str(tmp_path / "cur"), schema,
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    curated_t = SnapTable(str(tmp_path / "cur/curated"))
    folds_t = SnapTable(str(tmp_path / "cur/folds"))
    bands_t = SnapTable(str(tmp_path / "cur/bands"))
    curated = curated_t.read(spark).toPandas()
    folds = folds_t.read(spark).toPandas()

    ok, exp_surv, exp_folds = _expected(allrows.toPandas())
    assert set(curated["image_id"]) == exp_surv
    got_folds = dict(zip(folds["image_id"], folds["dup_of"]))
    assert got_folds == exp_folds
    # curated + folds partition the gate-passers; nothing lost or doubled
    assert set(curated["image_id"]) | set(folds["image_id"]) == ok
    assert not (set(curated["image_id"]) & set(folds["image_id"]))
    # cross-batch folds (originals arrived first) kept the ORIGINAL:
    # first-wins, the documented deviation from batch CC's min-id rule
    cross = {d: t for d, t in exp_folds.items() if d.startswith("dup") and _num(d) < 100}
    assert cross and all(t.startswith("img") for t in cross.values())
    # same-batch pairs elected the min id (the batch pipeline's rule)
    same = {d: t for d, t in exp_folds.items() if d.startswith("img")}
    assert same and all(t.startswith("dup") for t in same.values())
    # bands log carries n_bands rows per accepted image
    assert bands_t.read(spark).count() == SC.N_BANDS * len(exp_surv)

    # replay with no new data: effectively-once, no new commits
    v_c, v_b, v_f = (t.current_version() for t in (curated_t, bands_t, folds_t))
    SC.stream_curate_images(
        spark, str(src / "*"), str(tmp_path / "cur"), schema,
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    assert (curated_t.current_version(), bands_t.current_version(),
            folds_t.current_version()) == (v_c, v_b, v_f)

    # incremental continuation: only the new file is processed; prior
    # survivors are never revoked and the accumulated folds stay exact
    extra = synth.generate_images_with_dups(spark, 320).filter(
        F.substring("image_id", 4, 12).cast("long") >= 300
    )
    n_extra_rows = extra.count()
    assert n_extra_rows > 0
    extra.coalesce(1).write.mode("overwrite").parquet(str(src / "b3.parquet"))
    SC.stream_curate_images(
        spark, str(src / "*"), str(tmp_path / "cur"), schema,
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    cur2 = curated_t.read(spark).toPandas()
    # previous survivors untouched (append-only; first-wins never revokes)
    assert set(curated["image_id"]) <= set(cur2["image_id"])
    ok2, exp_surv2, exp_folds2 = _expected(
        synth.generate_images_with_dups(spark, 320).toPandas()
    )
    assert set(cur2["image_id"]) == exp_surv2
    assert dict(zip(*(folds_t.read(spark).toPandas()[c] for c in ("image_id", "dup_of")))) == exp_folds2


def test_curate_batch_no_dups_and_empty_log(spark):
    """Degenerate shapes: a batch with no near-dups against no accepted
    log (first batch) — everything survives, folds empty, CC tolerates
    an empty edge set."""
    imgs = synth.generate_images(spark, 40, partitions=2)
    ok = SC._gated_features(imgs, 0.0, 255.0, 0.0, 0)
    surv, folds = SC.curate_batch(ok, None)
    assert surv.count() == 40
    assert folds.count() == 0
    assert set(surv.toPandas()["n_dups"]) == {0}


def test_band_bloom_filter_and_probe_pushdown(spark, tmp_path):
    """The bands-log point-lookup layout: stream_curate_images writes the
    bands table under bloom_filter_options(["band_val"]) (every non-empty
    row group carries the filter), curate_batch pushes In(band_val, ...)
    into the accepted-log scan for batches under probe_pushdown_limit,
    and the pushdown changes nothing about the results (superset filter:
    band_val keys without the band ordinal)."""
    import glob

    allrows, batches = _world(spark, n=200)
    src = tmp_path / "drops"
    src.mkdir()
    for i, b in enumerate(batches[:2]):
        b.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}.parquet"))
    SC.stream_curate_images(
        spark, str(src / "*"), str(tmp_path / "cur"), synth.IMAGES_SCHEMA,
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    from tests.test_streaming_sync import _bloom_filters

    files = glob.glob(
        str(tmp_path / "cur/bands/data/**/*.parquet"), recursive=True
    )
    assert files
    counts = [_bloom_filters(spark, f, "band_val") for f in files]
    assert sum(n for n, _ in counts) > 0
    assert all(n == have for n, have in counts)

    # re-run batch 1 through curate_batch directly against the persisted
    # bands log: the pushed In(band_val, ...) predicate reaches the scan,
    # and pushdown-off produces identical folds
    bands_t = SnapTable(str(tmp_path / "cur/bands"))
    ok1 = SC._gated_features(batches[1], BRIGHT_LO, BRIGHT_HI, 0.0, 0).localCheckpoint()
    acc = bands_t.read(spark)
    _, folds_pd = SC.curate_batch(ok1, acc)
    plan = folds_pd._jdf.queryExecution().executedPlan().toString()
    pushed = [
        l.split("PushedFilters")[1]
        for l in plan.splitlines()
        if "PushedFilters" in l and "band_val" in l
    ]
    assert any("In(band_val" in s for s in pushed)
    _, folds_plain = SC.curate_batch(ok1, acc, probe_pushdown_limit=0)
    plain_plan = folds_plain._jdf.queryExecution().executedPlan().toString()
    assert "In(band_val" not in plain_plan
    get = lambda df: sorted(
        map(tuple, df.toPandas()[["image_id", "dup_of"]].itertuples(index=False))
    )
    assert get(folds_pd) == get(folds_plain)


def test_mid_batch_crash_between_appends(spark, tmp_path, monkeypatch):
    """Crash consistency of the three-append commit sequence: a failure
    AFTER the curated append but BEFORE the bands/folds appends of one
    micro-batch must leave a state a restart completes to exactly the
    uninterrupted run's tables — this exercises the replay path where
    done_curated=True but the batch's bands are missing (and, had bands
    committed first, the self-probe same-id exclusion)."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from gtfs_osm_sync_spark.pipeline import InjectedFailure

    allrows, batches = _world(spark, n=200)
    schema = synth.IMAGES_SCHEMA
    src = tmp_path / "drops"
    src.mkdir()
    for i, b in enumerate(batches[:2]):
        b.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}.parquet"))

    # uninterrupted reference run
    SC.stream_curate_images(
        spark, str(src / "*"), str(tmp_path / "ref"), schema,
        checkpoint_dir=str(tmp_path / "ckpt_ref"), max_files_per_trigger=1,
    )

    # faulty run: the bands append of batch 1 dies once, after batch 1's
    # curated rows are already committed
    real_snaptable = SC.SnapTable
    state = {"armed": True}

    class FaultySnapTable(real_snaptable):
        def append(self, df, checkpoint=None):
            if (
                state["armed"]
                and self.root.endswith("/bands")
                and checkpoint
                and checkpoint.get("chunks") == [1]
            ):
                state["armed"] = False
                raise InjectedFailure("crash between curated and bands appends")
            return super().append(df, checkpoint=checkpoint)

    monkeypatch.setattr(SC, "SnapTable", FaultySnapTable)
    with pytest.raises((StreamingQueryException, InjectedFailure)):
        SC.stream_curate_images(
            spark, str(src / "*"), str(tmp_path / "res"), schema,
            checkpoint_dir=str(tmp_path / "ckpt_res"), max_files_per_trigger=1,
        )
    cur_t = SnapTable(str(tmp_path / "res/curated"))
    assert 1 in cur_t.processed_chunks("curate")  # curated landed
    assert 1 not in SnapTable(str(tmp_path / "res/bands")).processed_chunks("curate")

    # restart (fault disarmed): the half-committed batch completes
    monkeypatch.setattr(SC, "SnapTable", real_snaptable)
    SC.stream_curate_images(
        spark, str(src / "*"), str(tmp_path / "res"), schema,
        checkpoint_dir=str(tmp_path / "ckpt_res"), max_files_per_trigger=1,
    )
    import pandas as pd

    def canon(root, table):
        pdf = SnapTable(str(tmp_path / f"{root}/{table}")).read(spark).toPandas()
        pdf = pdf.sort_index(axis=1)
        # bands has n_bands rows per image: total-order on all columns
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    for table in ("curated", "bands", "folds"):
        pd.testing.assert_frame_equal(
            canon("ref", table), canon("res", table), check_dtype=False
        )


def test_checkpoint_dir_required(spark, tmp_path):
    import pytest

    schema = synth.IMAGES_SCHEMA
    with pytest.raises(ValueError, match="checkpoint_dir"):
        SC.stream_curate_images(
            spark, str(tmp_path / "x"), str(tmp_path / "y"), schema,
            checkpoint_dir=None,
        )


def test_stream_compaction_bounds_log_and_preserves_probe(spark, tmp_path):
    """VERDICT r5 #3: the accepted-bands log (re-read every micro-batch)
    must not grow manifest entries without bound. With a tight
    compact_max_tail the stream's tables stay within the cadence bound,
    results are identical to an uncompacted run, the band_val bloom
    write options survive the rewrite, and the compacted log still
    answers the In-pushdown probe identically."""
    import glob

    allrows, batches = _world(spark, n=300)
    src = tmp_path / "drops"
    src.mkdir()
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}.parquet"))
    schema = synth.IMAGES_SCHEMA

    SC.stream_curate_images(
        spark, str(src / "*"), str(tmp_path / "plain"), schema,
        checkpoint_dir=str(tmp_path / "ck_plain"), max_files_per_trigger=1,
        compact_max_tail=None,
    )
    SC.stream_curate_images(
        spark, str(src / "*"), str(tmp_path / "cad"), schema,
        checkpoint_dir=str(tmp_path / "ck_cad"), max_files_per_trigger=1,
        compact_max_tail=1,
    )
    import pandas as pd

    def canon(t):
        pdf = t.read(spark).toPandas().sort_index(axis=1)
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    for table in ("curated", "bands", "folds"):
        plain_t = SnapTable(str(tmp_path / f"plain/{table}"))
        cad_t = SnapTable(str(tmp_path / f"cad/{table}"))
        assert cad_t.tail_entry_count() <= 1
        assert any(s.operation == "compact" for s in cad_t.snapshots())
        pd.testing.assert_frame_equal(canon(plain_t), canon(cad_t), check_dtype=False)

    # bloom options survived the rewrite: the compacted BASE tree's
    # parquet files still carry the band_val filter
    bands_t = SnapTable(str(tmp_path / "cad/bands"))
    assert bands_t.snapshot().write_options  # persisted through compact
    from tests.test_streaming_sync import _bloom_filters

    base_rel = bands_t.snapshot().base_files[0]
    files = glob.glob(
        str(tmp_path / "cad/bands" / base_rel / "**/*.parquet"), recursive=True
    ) + glob.glob(str(tmp_path / "cad/bands" / base_rel))
    files = [f for f in files if f.endswith(".parquet")]
    assert files
    counts = [_bloom_filters(spark, f, "band_val") for f in files]
    assert sum(n for n, _ in counts) > 0 and all(n == have for n, have in counts)

    # the compacted log answers the pushed-In probe identically
    ok2 = SC._gated_features(batches[2], BRIGHT_LO, BRIGHT_HI, 0.0, 0).localCheckpoint()
    acc = bands_t.read(spark)
    _, folds_push = SC.curate_batch(ok2, acc)
    plan = folds_push._jdf.queryExecution().executedPlan().toString()
    assert "In(band_val" in plan
    _, folds_plain = SC.curate_batch(ok2, acc, probe_pushdown_limit=0)
    get2 = lambda df: sorted(
        map(tuple, df.toPandas()[["image_id", "dup_of"]].itertuples(index=False))
    )
    assert get2(folds_push) == get2(folds_plain)
