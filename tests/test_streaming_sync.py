"""Incremental stop↔node sync: delta re-compare over a stream of node
updates must equal a from-scratch batch compare of the final state."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gtfs_osm_sync_spark import synth
from gtfs_osm_sync_spark.operators import compare as C
from gtfs_osm_sync_spark.sources.snaptable import SnapTable
from gtfs_osm_sync_spark.streaming import sync as S

AG = synth.COMPARE_AGENCY
UPDATE_SCHEMA = synth.COMPARE_NODES_SCHEMA + ", deleted boolean"


def _stops(spark, rows):
    return spark.createDataFrame(
        [
            (g, lat, lon, str(lat), str(lon), nm, nm, AG, g.lstrip("0") or "0")
            for g, lat, lon, nm in rows
        ],
        synth.COMPARE_STOPS_SCHEMA,
    )


def _updates(spark, rows):
    # (osm_id, lat, lon, tags, elem_idx, deleted)
    return spark.createDataFrame(
        [
            (o, "2", "u", "t", lat, lon, tags, 0, idx, deleted)
            for o, lat, lon, tags, idx, deleted in rows
        ],
        UPDATE_SCHEMA,
    )


def _world(spark):
    """5 stops; update batches add / move / retag / delete nodes around
    them so every category transition direction is exercised."""
    stops = _stops(
        spark,
        [
            ("0000001", 10.0, 20.0, "S1"),   # gains an id match in b1
            ("0000002", 30.0, 40.0, "S2"),   # id match in b0; node DELETED in b2
            ("0000003", 50.0, 60.0, "S3"),   # clean forever (never touched)
            ("0000004", 70.0, 80.0, "S4"),   # foreign neighbor appears in b1 -> conflict
            ("0000005", 11.0, 21.0, "S5"),   # b0 match MOVES out of range in b2
        ],
    )
    b0 = _updates(
        spark,
        [
            ("n2", 30.0005, 40.0, {"gtfs_id": "2", "operator": AG, "name": "Old2"}, 1, False),
            ("n5", 11.0005, 21.0, {"gtfs_id": "5", "operator": AG}, 2, False),
            ("nFar", 0.0, 0.0, {"gtfs_id": "9", "operator": AG}, 3, False),
        ],
    )
    b1 = _updates(
        spark,
        [
            ("n1", 10.0008, 20.0, {"gtfs_id": "1", "operator": AG, "name": "One"}, 1, False),
            ("nx4", 70.0008, 80.0, {"operator": AG, "name": "mystery"}, 2, False),
        ],
    )
    b2 = _updates(
        spark,
        [
            ("n2", 30.0005, 40.0, {"gtfs_id": "2", "operator": AG}, 1, True),  # delete
            ("n5", 12.5, 21.0, {"gtfs_id": "5", "operator": AG}, 2, False),    # move away
        ],
    )
    return stops, [b0, b1, b2]


_CMP_COLS = ["gtfs_id", "category", "osm_id", "dist_m", "merged_tags"]


def _sorted_rows(df):
    return sorted(
        (r["gtfs_id"], r["category"], r["osm_id"],
         None if r["dist_m"] is None else round(r["dist_m"], 6),
         None if r["merged_tags"] is None else tuple(sorted(r["merged_tags"].items())))
        for r in df.select(*_CMP_COLS).collect()
    )


def test_incremental_equals_full_batch(spark, tmp_path):
    # full_recompare_frac=None forces the DELTA machinery (affected-stop
    # subset + cell prune + id shrink) — at this 5-stop scale the default
    # 10% fallback would short-circuit every batch to a full compare and
    # silently un-test the delta path
    stops, batches = _world(spark)
    nlog = SnapTable(str(tmp_path / "nodes"))
    rlog = SnapTable(str(tmp_path / "results"))
    for bid, b in enumerate(batches):
        S.apply_update_batch(
            spark, b, nlog, rlog, stops, [AG], bid,
            full_recompare_frac=None, id_digits=synth._CMP_DIGITS,
        )
        # invariant after EVERY batch, not just the last one
        merged = S.current_results(rlog, spark)
        full = C.compare_stops(
            stops, S.current_nodes(nlog.read(spark)), [AG], id_digits=synth._CMP_DIGITS
        )
        assert _sorted_rows(merged) == _sorted_rows(full), f"diverged after batch {bid}"

    # the final state must show every planned transition
    cats = {r["gtfs_id"]: (r["category"], r["osm_id"])
            for r in S.current_results(rlog, spark).collect()}
    assert cats["0000001"] == ("MODIFY", "n1")           # appeared in b1
    assert cats["0000002"][0] == "UPLOAD_NO_CONFLICT"    # match deleted in b2
    assert cats["0000003"][0] == "UPLOAD_NO_CONFLICT"    # never touched
    assert cats["0000004"][0] == "UPLOAD_CONFLICT"       # foreign neighbor b1
    assert cats["0000005"][0] == "UPLOAD_NO_CONFLICT"    # match moved away b2


def test_incremental_noprune_equals_full_batch(spark, tmp_path):
    """prune_node_cells=False (the pre-pruning formulation, kept for
    state layouts without cell locality) must produce the same merged
    results as the full batch compare — and therefore as the default
    pruned path."""
    stops, batches = _world(spark)
    nlog = SnapTable(str(tmp_path / "nodes_np"))
    rlog = SnapTable(str(tmp_path / "results_np"))
    for bid, b in enumerate(batches):
        S.apply_update_batch(
            spark, b, nlog, rlog, stops, [AG], bid,
            prune_node_cells=False, full_recompare_frac=None,
            id_digits=synth._CMP_DIGITS,
        )
    merged = S.current_results(rlog, spark)
    full = C.compare_stops(
        stops, S.current_nodes(nlog.read(spark)), [AG], id_digits=synth._CMP_DIGITS
    )
    assert _sorted_rows(merged) == _sorted_rows(full)


def test_wide_batch_falls_back_to_full_compare(spark, tmp_path):
    """With the default full_recompare_frac, a batch touching more than
    10% of the feed re-compares EVERY stop (the delta machinery has no
    selectivity left — measured at 4M stops, BENCH/delta_sync.json) and
    the merged results still equal the batch compare."""
    stops, batches = _world(spark)
    nlog = SnapTable(str(tmp_path / "nodes_fb"))
    rlog = SnapTable(str(tmp_path / "results_fb"))
    ns = []
    for bid, b in enumerate(batches):
        ns.append(S.apply_update_batch(
            spark, b, nlog, rlog, stops, [AG], bid, id_digits=synth._CMP_DIGITS
        ))
    n_stops = stops.count()
    # batches 1/2 touch 2-3 of 5 stops (> 10%) -> full re-compare of all
    assert ns[1] == n_stops and ns[2] == n_stops
    merged = S.current_results(rlog, spark)
    full = C.compare_stops(
        stops, S.current_nodes(nlog.read(spark)), [AG], id_digits=synth._CMP_DIGITS
    )
    assert _sorted_rows(merged) == _sorted_rows(full)


def test_replayed_batch_is_noop(spark, tmp_path):
    stops, batches = _world(spark)
    nlog = SnapTable(str(tmp_path / "nodes"))
    rlog = SnapTable(str(tmp_path / "results"))
    S.apply_update_batch(spark, batches[0], nlog, rlog, stops, [AG], 0,
                         id_digits=synth._CMP_DIGITS)
    v_n, v_r = nlog.current_version(), rlog.current_version()
    n = S.apply_update_batch(spark, batches[0], nlog, rlog, stops, [AG], 0,
                             id_digits=synth._CMP_DIGITS)
    assert n == 0
    assert nlog.current_version() == v_n and rlog.current_version() == v_r


def test_stream_wrapper_and_restart(spark, tmp_path):
    stops, batches = _world(spark)
    src = tmp_path / "drops"
    src.mkdir()
    from pyspark.sql import types as T

    schema = spark.createDataFrame([], UPDATE_SCHEMA).schema
    # drop the batches as separate files BEFORE starting: availableNow
    # drains them (micro-batch boundaries may merge files; equivalence
    # holds regardless because the delta set is a union)
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}.parquet"))
    # file-source needs a flat dir of files; point at the dir of dirs
    paths = str(src / "*")

    S.stream_node_sync(
        spark, paths, schema,
        str(tmp_path / "nodes"), str(tmp_path / "results"),
        stops, [AG], checkpoint_dir=str(tmp_path / "ckpt"),
        id_digits=synth._CMP_DIGITS,
    )
    nlog, rlog = SnapTable(str(tmp_path / "nodes")), SnapTable(str(tmp_path / "results"))
    merged = S.current_results(rlog, spark)
    full = C.compare_stops(
        stops, S.current_nodes(nlog.read(spark)), [AG], id_digits=synth._CMP_DIGITS
    )
    assert _sorted_rows(merged) == _sorted_rows(full)

    # restart with the same checkpoint: no new data -> no new commits
    v_n, v_r = nlog.current_version(), rlog.current_version()
    S.stream_node_sync(
        spark, paths, schema,
        str(tmp_path / "nodes"), str(tmp_path / "results"),
        stops, [AG], checkpoint_dir=str(tmp_path / "ckpt"),
        id_digits=synth._CMP_DIGITS,
    )
    assert nlog.current_version() == v_n and rlog.current_version() == v_r


def test_coarse_partition_filter_prunes_scan(spark, tmp_path):
    """The node-log layout apply_update_batch prescribes (parquet
    partitioned by the COARSE_RES cell) must turn the delta's coarse-cell
    filter into scan-level PartitionFilters — partitions outside the
    affected rings are never read (the 100 TB contract; wall-time
    evidence in BENCH/delta_sync.json)."""
    path = str(tmp_path / "pstate")
    df = spark.range(100).select(
        F.col("id").alias("osm_id"),
        (F.col("id") % 7).alias("cell_part"),
        F.rand(1).alias("lat"),
    )
    df.write.mode("overwrite").partitionBy("cell_part").parquet(path)
    rd = spark.read.parquet(path).filter(F.col("cell_part").isin([1, 3]))
    plan = rd._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan and "cell_part" in scan[0].split("PartitionFilters")[1].split("]")[0]
    assert rd.count() == len([i for i in range(100) if i % 7 in (1, 3)])


def _stamped_feed(spark, tmp_path, stops, name="feed_part"):
    """The round-5 feed layout: cells stamped once at ingest, stored
    partitionBy the coarse cell, read back (cell_part becomes a hive
    partition column -> the per-batch filter partition-prunes the scan)."""
    path = str(tmp_path / name)
    S.stamp_feed_cells(stops).write.mode("overwrite").partitionBy(
        "cell_part"
    ).parquet(path)
    return spark.read.parquet(path)


def test_partitioned_feed_and_compacted_log_equal_full_batch(spark, tmp_path):
    """The full round-5 layout — feed partitioned by cell_part (+ n_feed
    and cached feed_ids passed in, so no per-batch feed count), node log
    opened partitioned and compacted mid-stream — must produce merged
    results identical to the from-scratch batch compare after every
    batch, including batches that run against a compacted base + tail."""
    stops, batches = _world(spark)
    feed = _stamped_feed(spark, tmp_path, stops)
    nf = feed.count()
    fids = feed.select("gtfs_id").cache()
    nlog = SnapTable(str(tmp_path / "nodes_p"), partition_by="cell_part")
    rlog = SnapTable(str(tmp_path / "results_p"))
    for bid, b in enumerate(batches):
        S.apply_update_batch(
            spark, b, nlog, rlog, feed, [AG], bid,
            full_recompare_frac=None, n_feed=nf, feed_ids=fids,
            id_digits=synth._CMP_DIGITS,
        )
        if bid == 0:
            # compact after the bootstrap batch: batches 1..2 exercise
            # the pruned-base + full-tail state read
            S.compact_node_log(spark, nlog)
            base, tail = nlog.read_split(spark)
            assert base is not None and tail is None
            assert "cell_part" in base.columns
        merged = S.current_results(rlog, spark)
        full = C.compare_stops(
            stops, S.current_nodes(nlog.read(spark)), [AG],
            id_digits=synth._CMP_DIGITS,
        )
        assert _sorted_rows(merged) == _sorted_rows(full), f"diverged after batch {bid}"
    # post-compaction appends are the tail
    base, tail = nlog.read_split(spark)
    assert base is not None and tail is not None


def test_feed_partition_filter_prunes_scan(spark, tmp_path):
    """The feed-side mirror of test_coarse_partition_filter_prunes_scan:
    filtering the partitioned feed by the changed nodes' coarse ring
    cells (exactly apply_update_batch's code path) must show
    PartitionFilters on cell_part in the physical plan, and the pruned
    feed must still contain every affected stop."""
    stops, batches = _world(spark)
    feed = _stamped_feed(spark, tmp_path, stops, "feed_plan")
    # b2's changed positions: around stops 2 and 5 only
    changed = batches[2].select("lat", "lon")
    cells = S.coarse_partition_cells(changed)
    pruned = feed.filter(F.col("cell_part").isin(cells))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan and "cell_part" in scan[0].split("PartitionFilters")[1].split("]")[0]
    # covering contract: every stop within the radius of a changed
    # position survives the prune
    touched_full = {r["gtfs_id"]
                    for r in S.affected_stop_ids(stops, changed).collect()}
    touched_pruned = {r["gtfs_id"]
                      for r in S.affected_stop_ids(pruned, changed).collect()}
    assert touched_full == touched_pruned and touched_full
    # and the prune is real: the far-away stops' partitions are gone
    kept = {r["gtfs_id"] for r in pruned.select("gtfs_id").collect()}
    assert len(kept) < stops.count()


def test_feed_prune_regime_switch(spark, tmp_path):
    """Batches whose ring sets cover more than feed_prune_max_cells
    coarse cells skip the feed filter (a wide scatter prunes nothing
    and the isin literal-set eval is pure cost); the merged results are
    identical in both regimes."""
    stops, batches = _world(spark)
    feed = _stamped_feed(spark, tmp_path, stops, "feed_regime")
    nf = feed.count()
    results = {}
    for regime, max_cells in (("prune", 10_000), ("plain", 0)):
        nlog = SnapTable(str(tmp_path / f"nodes_{regime}"))
        rlog = SnapTable(str(tmp_path / f"results_{regime}"))
        for bid, b in enumerate(batches):
            S.apply_update_batch(
                spark, b, nlog, rlog, feed, [AG], bid,
                full_recompare_frac=None, n_feed=nf,
                feed_prune_max_cells=max_cells,
                id_digits=synth._CMP_DIGITS,
            )
        results[regime] = _sorted_rows(S.current_results(rlog, spark))
    assert results["prune"] == results["plain"]
    # the switch itself: narrow ring set -> filtered feed; wide cutoff
    # exceeded -> the SAME frame back, no isin built at all
    changed = batches[1].select("lat", "lon")
    cells = S.coarse_partition_cells(changed)
    assert cells
    f_pruned, did = S._pruned_feed(feed, changed, 400.0, 10_000)
    assert did and f_pruned is not feed
    plan = f_pruned._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan and "cell_part" in scan[0].split("PartitionFilters")[1].split("]")[0]
    f_plain, did = S._pruned_feed(feed, changed, 400.0, len(cells) - 1)
    assert not did and f_plain is feed
    # a flat (unpartitioned) feed never prunes regardless of the knob
    f_flat, did = S._pruned_feed(stops, changed, 400.0, 10_000)
    assert not did and f_flat is stops


def test_prune_state_keeps_null_cell_rows(spark):
    """hex_cell-NULL state rows (pre-upgrade log files surfaced by the
    mergeSchema read) are unprunable, not out-of-ring: they must survive
    prune_state_to_stop_rings unconditionally (ADVICE r4 medium)."""
    stops = _stops(spark, [("0000001", 10.0, 20.0, "S1")])
    state = spark.createDataFrame(
        [("nNear", 10.0005, 20.0, None), ("nFarNull", 55.0, 55.0, None)],
        "osm_id string, lat double, lon double, hex_cell long",
    )
    from gtfs_osm_sync_spark.functions.cells import make_hex_cell_udf
    from gtfs_osm_sync_spark.operators.spatial_join import HEX_RES

    # nNear gets a real cell; nFarNull keeps NULL (simulates an old file)
    state = state.withColumn(
        "hex_cell",
        F.when(F.col("osm_id") == "nNear",
               make_hex_cell_udf(HEX_RES)("lat", "lon")),
    )
    pruned = S.prune_state_to_stop_rings(state, stops)
    ids = {r["osm_id"] for r in pruned.collect()}
    assert ids == {"nNear", "nFarNull"}  # NULL row kept, near row kept


def test_mixed_schema_log_rows_not_dropped(spark, tmp_path):
    """A node log whose early appends predate the hex_cell column must
    still feed ALL its rows through the pruned delta path: SnapTable's
    mergeSchema read surfaces hex_cell=NULL deterministically and the
    prune keeps those rows (the ADVICE r4 failure scenario end-to-end)."""
    log = SnapTable(str(tmp_path / "mixed"))
    old = spark.createDataFrame(
        [("nOld", "1", "u", "t", 10.0004, 20.0,
          {"gtfs_id": "1", "operator": AG}, 0, 1, False, 0)],
        UPDATE_SCHEMA + ", update_seq int",
    )
    log.append(old)  # pre-upgrade file: NO hex_cell column
    new = old.selectExpr(
        "osm_id", "version", "user", "timestamp", "lat + 60 as lat", "lon",
        "tags", "file_idx", "elem_idx", "deleted", "1 as update_seq",
    ).withColumn("osm_id", F.lit("nNew"))
    from gtfs_osm_sync_spark.functions.cells import make_hex_cell_udf
    from gtfs_osm_sync_spark.operators.spatial_join import HEX_RES

    log.append(new.withColumn("hex_cell",
                              make_hex_cell_udf(HEX_RES)("lat", "lon")))
    state = S.current_nodes(log.read(spark))
    assert "hex_cell" in state.columns  # mergeSchema: deterministic
    stops = _stops(spark, [("0000001", 10.0, 20.0, "S1")])
    pruned = S.prune_state_to_stop_rings(state, stops)
    ids = {r["osm_id"] for r in pruned.collect()}
    # nOld (NULL cell, pre-upgrade) kept; nNew (real cell, out of ring) pruned
    assert ids == {"nOld"}


def test_stream_wrapper_midstream_restart(spark, tmp_path):
    """Kill-between-batches replay: run the availableNow stream with only
    b0 present, then drop b1/b2 and run AGAIN with the same checkpoint —
    the second run must process only the new files (no recommit of b0's
    ledger chunks) and the merged results must equal the from-scratch
    batch compare of the final state."""
    stops, batches = _world(spark)
    src = tmp_path / "drops_mid"
    src.mkdir()
    schema = spark.createDataFrame([], UPDATE_SCHEMA).schema
    paths = str(src / "*")

    batches[0].coalesce(1).write.mode("overwrite").parquet(str(src / "b0.parquet"))
    S.stream_node_sync(
        spark, paths, schema,
        str(tmp_path / "nodes_mid"), str(tmp_path / "results_mid"),
        stops, [AG], checkpoint_dir=str(tmp_path / "ckpt_mid"),
        id_digits=synth._CMP_DIGITS,
    )
    nlog = SnapTable(str(tmp_path / "nodes_mid"))
    rlog = SnapTable(str(tmp_path / "results_mid"))
    v_n, v_r = nlog.current_version(), rlog.current_version()
    done_before = set(nlog.processed_chunks("sync"))
    assert done_before  # b0 committed

    # "restart": same checkpoint, two new drops
    for i in (1, 2):
        batches[i].coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{i}.parquet"))
    S.stream_node_sync(
        spark, paths, schema,
        str(tmp_path / "nodes_mid"), str(tmp_path / "results_mid"),
        stops, [AG], checkpoint_dir=str(tmp_path / "ckpt_mid"),
        id_digits=synth._CMP_DIGITS,
    )
    # b0's ledger entries were NOT recommitted, new batch ids are fresh
    assert done_before <= set(nlog.processed_chunks("sync"))
    assert nlog.current_version() > v_n and rlog.current_version() > v_r

    merged = S.current_results(rlog, spark)
    full = C.compare_stops(
        stops, S.current_nodes(nlog.read(spark)), [AG], id_digits=synth._CMP_DIGITS
    )
    assert _sorted_rows(merged) == _sorted_rows(full)


def _bloom_filters(spark, parquet_file, col):
    """(n_chunks, n_with_bloom) for `col` across the file's row groups,
    read back through parquet-java — the same reader Spark scans with.
    A zero-row part file has no row groups and returns (0, 0)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(parquet_file)
    inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
    n = have = 0
    try:
        blocks = reader.getFooter().getBlocks()
        for bi in range(blocks.size()):
            cols = blocks.get(bi).getColumns()
            for ci in range(cols.size()):
                c = cols.get(ci)
                if c.getPath().toDotString() == col:
                    n += 1
                    if reader.readBloomFilter(c) is not None:
                        have += 1
        return n, have
    finally:
        reader.close()


def test_bloom_filter_written_and_id_pushdown(spark, tmp_path):
    """The node-log point-lookup layout: a log opened with
    bloom_filter_options(["osm_id"]) writes an osm_id bloom filter into
    every data file (append AND the property survives re-open — it is a
    table property, not a one-shot writer arg), and the touched-id
    lookup pushes In(osm_id, ...) into the parquet scan — together these
    turn the per-batch old-position pass into row-group point lookups."""
    import glob

    from gtfs_osm_sync_spark.sources.snaptable import bloom_filter_options

    opts = bloom_filter_options(["osm_id"], ndv=100_000)
    stops, batches = _world(spark)
    nlog = SnapTable(str(tmp_path / "nodes_bloom"), write_options=opts)
    rlog = SnapTable(str(tmp_path / "results_bloom"))
    for bid, b in enumerate(batches):
        S.apply_update_batch(
            spark, b, nlog, rlog, stops, [AG], bid,
            full_recompare_frac=None, id_digits=synth._CMP_DIGITS,
        )
    files = glob.glob(
        str(tmp_path / "nodes_bloom" / "data" / "**" / "*.parquet"), recursive=True
    )
    assert files
    # every non-empty row group carries the osm_id bloom filter (empty
    # part files have no row groups — vacuously fine), and at least one
    # real chunk exists
    counts = [_bloom_filters(spark, f, "osm_id") for f in files]
    assert sum(n for n, _ in counts) > 0
    assert all(n == have for n, have in counts)
    # re-open WITHOUT the arg: options inherited from the manifest
    assert SnapTable(str(tmp_path / "nodes_bloom")).write_options == opts
    # control: an option-less table writes no bloom filter
    ctl = SnapTable(str(tmp_path / "nodes_ctl"))
    ctl.append(batches[0].withColumn("update_seq", F.lit(0)))
    ctl_files = glob.glob(str(tmp_path / "nodes_ctl" / "data" / "*.parquet"))
    ctl_counts = [_bloom_filters(spark, f, "osm_id") for f in ctl_files]
    assert sum(n for n, _ in ctl_counts) > 0
    assert sum(have for _, have in ctl_counts) == 0
    # the old-position lookup's predicate reaches the scan
    probe = nlog.read(spark).filter(F.col("osm_id").isin(["n2", "n5"]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert scans and all("osm_id" in s.split("PushedFilters")[1] for s in scans)


def test_id_pushdown_limit_zero_equals_default(spark, tmp_path):
    """id_pushdown_limit=0 forces the semi-join formulation of the
    old-position lookup (the wide-batch path); merged results must equal
    the from-scratch batch compare, i.e. the In-pushdown fast path and
    the semi-join are interchangeable."""
    stops, batches = _world(spark)
    nlog = SnapTable(str(tmp_path / "nodes_sj"))
    rlog = SnapTable(str(tmp_path / "results_sj"))
    for bid, b in enumerate(batches):
        S.apply_update_batch(
            spark, b, nlog, rlog, stops, [AG], bid,
            full_recompare_frac=None, id_pushdown_limit=0,
            id_digits=synth._CMP_DIGITS,
        )
    merged = S.current_results(rlog, spark)
    full = C.compare_stops(
        stops, S.current_nodes(nlog.read(spark)), [AG], id_digits=synth._CMP_DIGITS
    )
    assert _sorted_rows(merged) == _sorted_rows(full)
