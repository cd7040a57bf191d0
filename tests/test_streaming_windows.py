"""Watermarked event-time windows: correctness vs batch + the late-data
drop contract across a checkpointed restart (SURVEY §2.9)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gtfs_osm_sync_spark.streaming.windows import (
    run_windowed_counts_once,
    windowed_event_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _t(hh, mm):
    return dt.datetime(2026, 1, 1, hh, mm)


def test_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(i, _t(10, i % 25)) for i in range(50)]
    _write_events(spark, src, rows)
    collected: list = []
    run_windowed_counts_once(
        spark, src, SCHEMA, str(tmp_path / "ckpt"), collected
    )
    got = sorted(r for _, batch in collected for r in batch)
    batch_df = spark.read.parquet(src)
    want = sorted(
        map(tuple, windowed_event_counts(batch_df).collect())
    )
    assert got == want and len(want) == 3  # 10:00/10:10/10:20 windows


def test_late_event_dropped_after_restart(spark, tmp_path):
    """Run 1 advances the watermark to 10:50 (max event 11:00 - 10 min);
    run 2 resumes from the checkpoint with one LATE event (10:20 — its
    window is closed) and one fresh event (11:30). The late event must
    produce NO update; the fresh one must."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_events(
        spark, src, [(1, _t(10, 0)), (2, _t(10, 3)), (3, _t(11, 0))]
    )
    run1: list = []
    run_windowed_counts_once(spark, src, SCHEMA, ckpt, run1)
    windows1 = {r[0] for _, batch in run1 for r in batch}
    assert _t(10, 0) in windows1 and _t(11, 0) in windows1

    _write_events(spark, src, [(4, _t(10, 20)), (5, _t(11, 30))])
    run2: list = []
    run_windowed_counts_once(spark, src, SCHEMA, ckpt, run2)
    updated = {r[0] for _, batch in run2 for r in batch}
    assert _t(11, 30) in updated, "fresh event must update its window"
    assert _t(10, 20) not in updated, "late event (behind watermark) must be dropped"


def test_sessionize_stream_matches_batch_sessions(spark, tmp_path):
    """Gap sessionization: streaming session_window (availableNow drain)
    equals the batch computation of the same sessions."""
    from gtfs_osm_sync_spark.streaming.windows import sessionize_stream

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    rows = []
    for u in range(3):
        # two sessions per user: a burst at 10:00-10:10, another at 12:00
        rows += [(u, _t(10, m)) for m in (0, 5, 10)]
        rows += [(u, _t(12, 0))]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = sessionize_stream(stream, gap="30 minutes")
    out: list = []

    def sink(bdf, bid):
        out.append(sorted(map(tuple, bdf.collect())))

    def drain():
        q = (
            sessionize_stream(
                spark.readStream.schema(schema).parquet(src), gap="30 minutes"
            )
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # append mode emits a session only once the watermark passes its end;
    # the watermark lags one batch, so drive two drains: the first
    # finalizes the 10:00 sessions (watermark 12:00-1h=11:00), the second
    # gets a 15:00 "closer" event that finalizes the 12:00 sessions.
    drain()
    spark.createDataFrame([(99, _t(15, 0))], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    got = sorted(r for batch in out for r in batch)
    batch_want = sorted(
        map(tuple, sessionize_stream(spark.read.parquet(src)).collect())
    )
    # everything except the still-open 15:00 closer session must be out
    finalized = [w for w in batch_want if w[0] != 99]
    assert got == finalized
    # 2 sessions x 3 users; burst session spans 10:00 -> 10:10+gap
    assert len(finalized) == 6
    burst = [w for w in finalized if w[1] == _t(10, 0)][0]
    assert burst[3] == 3 and burst[2] == _t(10, 40)


def test_first_k_per_key_stateful_across_restart(spark, tmp_path):
    """applyInPandasWithState: the per-key quota must persist in the
    state store across a checkpointed restart — run 1 consumes part of
    each key's quota, run 2's events only fill the remainder."""
    from gtfs_osm_sync_spark.streaming.windows import first_k_per_key

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    src = str(tmp_path / "fk_src")
    ckpt = str(tmp_path / "fk_ckpt")
    out: list = []

    def drain():
        q = (
            first_k_per_key(spark.readStream.schema(schema).parquet(src), k=2)
            .writeStream.outputMode("append")
            .foreachBatch(lambda bdf, bid: out.append(sorted(map(tuple, bdf.collect()))))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: user 1 sends 1 event, user 2 sends 3 (quota 2 -> emits 2)
    spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21), (2, 22)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    # run 2: user 1 sends 2 more (1 fits), user 2 sends 1 more (0 fits)
    spark.createDataFrame([(1, 11), (1, 12), (2, 23)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    drain()

    emitted = sorted(r for batch in out for r in batch)
    by_user: dict = {}
    for u, e in emitted:
        by_user.setdefault(u, []).append(e)
    assert len(by_user[1]) == 2 and by_user[1][0] == 10
    assert len(by_user[2]) == 2 and set(by_user[2]) <= {20, 21, 22}
    assert (2, 23) not in emitted  # quota exhausted in run 1


def test_first_k_per_key_multi_chunk_arrow_batches(spark, tmp_path):
    """Regression: when one key's micro-batch arrives as MULTIPLE Arrow
    chunks (forced here with maxRecordsPerBatch=2), chunks skipped by the
    quota early-out must not shrink the emit from the buffered chunks.
    The pre-fix code folded skipped-chunk lengths into n_seen before
    computing take, emitting 0 rows instead of k whenever a group
    exceeded the Arrow per-batch record cap while quota remained."""
    from gtfs_osm_sync_spark.streaming.windows import first_k_per_key

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    src = str(tmp_path / "fkc_src")
    ckpt = str(tmp_path / "fkc_ckpt")
    out: list = []
    # one key, 7 rows in a single micro-batch -> chunks of 2/2/2/1
    spark.createDataFrame(
        [(1, e) for e in range(7)], schema
    ).coalesce(1).write.parquet(src)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        q = (
            first_k_per_key(spark.readStream.schema(schema).parquet(src), k=2)
            .writeStream.outputMode("append")
            .foreachBatch(
                lambda bdf, bid: out.append(sorted(map(tuple, bdf.collect())))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    emitted = sorted(r for batch in out for r in batch)
    assert len(emitted) == 2 and {u for u, _ in emitted} == {1}


def test_first_k_per_key_order_col_deterministic(spark, tmp_path):
    """With order_col, 'first k' means smallest-k by that column within
    the batch, independent of file/row arrival order (without it, intra-
    batch order is whatever the source produced — not a contract)."""
    from gtfs_osm_sync_spark.streaming.windows import first_k_per_key

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    src = str(tmp_path / "fko_src")
    ckpt = str(tmp_path / "fko_ckpt")
    out: list = []
    # deliberately shuffled event order, split across two files
    spark.createDataFrame([(1, 94), (1, 12), (2, 55)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame([(1, 3), (1, 41), (2, 7)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = (
        first_k_per_key(
            spark.readStream.schema(schema).parquet(src), k=2, order_col="event_id"
        )
        .writeStream.outputMode("append")
        .foreachBatch(lambda bdf, bid: out.append(sorted(map(tuple, bdf.collect()))))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = sorted(r for batch in out for r in batch)
    # both files land in one availableNow batch -> smallest two event_ids per key
    assert emitted == [(1, 3), (1, 12), (2, 7), (2, 55)]
