"""Event-time windowed aggregation with watermarks (SURVEY §2.9 stretch).

The reference has no streaming (one-shot SwingWorker batch,
task/CompareData.java:1388-1445); the north rule's continuous-feed analog
is Structured Streaming: `readStream -> withWatermark -> window agg ->
writeStream`. This module holds the query builders; tests drive them with
file sources + availableNow triggers and assert the LATE-DATA contract
(an event older than the watermark is dropped, fresher windows still
update) across a checkpointed restart — the semantics a 100 TB/day feed
relies on to bound state.

Scale notes: the windowed count is a partial-aggregating shuffle keyed on
(window, key); watermarking bounds the state store to
O(active windows x keys); checkpointing makes the query restartable with
exactly-once state (the sink side pairs with SnapTable's idempotent
commits, streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = None,
    window_dur: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding) event-time counts with a watermark.

    Works on both streaming and batch frames (batch ignores the
    watermark) — tests compare the streaming result against the same
    expression run in batch."""
    df = stream_df.withWatermark(ts_col, watermark) if stream_df.isStreaming else stream_df
    grp = [F.window(F.col(ts_col), window_dur, slide)]
    if key_col:
        grp.append(F.col(key_col))
    out = df.groupBy(*grp).agg(F.count("*").alias("n"))
    cols = [
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
    ]
    if key_col:
        cols.append(F.col(key_col))
    return out.select(*cols, "n")


def run_windowed_counts_once(
    spark,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    collected: list,
    ts_col: str = "ts",
    key_col: str | None = None,
    window_dur: str = "10 minutes",
    watermark: str = "10 minutes",
) -> None:
    """Drain the file source once (availableNow) in UPDATE mode; each
    micro-batch's emitted window updates append to `collected` as
    (batch_id, rows). Update mode + watermark = the canonical late-data
    demonstration: a dropped late event produces NO update row for its
    window on restart."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(
        stream, ts_col=ts_col, key_col=key_col, window_dur=window_dur, watermark=watermark
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        collected.append((int(batch_id), sorted(map(tuple, batch_df.collect()))))

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionize_stream(
    stream_df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    the built-in session_window (state bounded by the watermark). The
    batch twin is e01's window-lag formulation; tests pin the two equal
    on the same data. Returns (key, session_start, session_end, n_events).

    session_window is the declarative form Spark can incrementalize —
    a hand-rolled applyInPandasWithState would carry the same state for
    more code and no added semantics here.
    """
    df = (
        stream_df.withWatermark(ts_col, watermark)
        if stream_df.isStreaming
        else stream_df
    )
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def first_k_per_key(
    stream_df: DataFrame,
    key_col: str = "user_id",
    k: int = 2,
    order_col: str | None = None,
):
    """Custom stateful operator the built-ins can't express: keep only the
    FIRST k events per key ACROSS micro-batches (dropDuplicates keeps 1;
    limits aren't keyed). applyInPandasWithState holds one counter per
    key in the state store; each batch emits that key's remaining quota.

    Ordering caveat: WITHOUT order_col, "first" means arrival order,
    which for file/replayed sources is whatever intra-batch row order
    Spark produces — NOT a contract (fine for sampling-k semantics,
    wrong for earliest-k). Pass order_col (e.g. the event-time column)
    to make it deterministic WITHIN each micro-batch: the batch's rows
    sort by (order_col) before the quota is applied. Cross-batch order
    is already fixed by batch sequence; late rows in a later batch still
    lose — that is the streaming contract (use a watermarked window agg
    for full event-time ordering).

    Scale: state is O(distinct keys) x one long; rows stream through
    Arrow in per-key batches; the per-batch sort is per-key in-memory
    pandas (bounded by the key's batch slice, not the stream).
    The state store checkpoints with the query, so restarts resume the
    quota exactly (test pins this).
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = stream_df.schema
    state_schema = T.StructType([T.StructField("n_seen", T.LongType())])

    def fn(key, pdfs, state: GroupState):
        # n_start snapshots the quota at function entry: the emit count must
        # be judged against rows seen in PRIOR batches only. Chunks skipped
        # by the early-out below arrive AFTER the buffered ones, so their
        # lengths go to `skipped`, never into the take computation — folding
        # them into n_seen before `take` silently shrank the emit whenever a
        # group spanned multiple Arrow chunks while quota remained.
        (n_start,) = state.get if state.exists else (0,)
        chunks, buffered, skipped = [], 0, 0
        for pdf in pdfs:
            if order_col is None and n_start + buffered >= k:
                skipped += len(pdf)
                continue
            chunks.append(pdf)
            buffered += len(pdf)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            if order_col is not None:
                batch = batch.sort_values(order_col, kind="mergesort", ignore_index=True)
            take = max(min(k - n_start, len(batch)), 0)
            if take > 0:
                yield batch.iloc[:take]
        state.update((n_start + buffered + skipped,))

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
