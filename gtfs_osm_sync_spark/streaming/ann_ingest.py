"""Incremental IVF index ingestion over a stream of vector micro-batches.

The batch build (operators/similarity.ivf_store) assumes the whole corpus
is visible at once. A training-data pipeline ingests embeddings
continuously; rebuilding the index per drop re-pays an O(corpus)
assignment every time. This module keeps the index incremental:

  vector micro-batches (file source / availableNow)
    -> per-batch centroid assignment via ivf_assign_bcast: the broadcast
       join keeps every micro-batch plan SMALL (the literal fold would
       re-pay its n_lists x dim plan-compile cost on every batch — the
       round-5 Lloyd lesson applied to streaming), work stays on
       executors as one batch-keyed aggregation
    -> effectively-once append to the ivf_store SnapTable (hive
       partition_by list_id) under a (run_id, batch_id) ledger — a
       replayed micro-batch after a crash is skipped, so the index never
       holds a vector twice
    -> maybe_compact cadence bounds the manifest as batches accumulate
       (the curation-stream contract); compaction goes through the
       table's partitioned writer, so the list_id serving layout — and
       ivf_topk_stored's In(list_id) PartitionFilters — hold across
       rewrites

Centroids are FIXED for the lifetime of the index (standard IVF
operations: retraining centroids is an offline rebuild — new store root,
atomic cut-over — because moving a centroid invalidates every prior
assignment). The stream therefore takes the centroid frame once, up
front.

Search during ingestion needs no coordination: ivf_topk_stored reads the
store's current snapshot — appends are atomic manifest flips, so a
concurrent query sees the pre- or post-batch index, never a torn one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ivf_assign_bcast
from ..sources.snaptable import SnapTable


def stream_ivf_ingest(
    spark: SparkSession,
    source_dir: str,
    root: str,
    centroids: DataFrame,
    schema,
    run_id: str = "ivf",
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
    max_files_per_trigger: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_max_tail: int | None = 8,
    on_batch_done=None,
) -> SnapTable:
    """Start (and with trigger_once, drain) the incremental IVF ingest.
    The index lives at root/index (SnapTable, partition_by=list_id —
    the exact layout ivf_store writes, so ivf_topk_stored serves either
    interchangeably).

    checkpoint_dir is REQUIRED (streaming/curation.py's rationale:
    batch ids are only durable with a streaming checkpoint, and the
    effectively-once skip keys on them).

    on_batch_done: optional callback(dict) after each batch's commit
    (keys: batch_id, version, wall_sec, index_tail_entries)."""
    if not checkpoint_dir:
        raise ValueError(
            "checkpoint_dir is required: without a durable streaming "
            "checkpoint, batch_id restarts at 0 on re-run and the "
            "effectively-once ledger would skip fresh batches (data loss)"
        )
    # pin the centroid SNAPSHOT driver-side (bounded: n_lists rows):
    # a localCheckpoint would park non-replicated blocks on executors,
    # where a continuous stream loses them on any executor loss — a
    # LocalTableScan rebuilt from collected rows survives (review
    # finding r6)
    crows = centroids.select("list_id", vec_col).collect()
    cents = spark.createDataFrame(crows, centroids.select("list_id", vec_col).schema)
    index_t = SnapTable(f"{root}/index", partition_by="list_id")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        _t0 = _time.time()
        bid = int(batch_id)
        if bid in index_t.processed_chunks(run_id):
            return  # replayed micro-batch: already committed
        assigned = ivf_assign_bcast(batch_df, cents, id_col, vec_col)
        version = index_t.append(
            assigned,
            checkpoint={"run_id": run_id, "chunks": [bid], "source": "stream"},
        )
        if compact_max_tail is not None:
            index_t.maybe_compact(spark, max_tail=compact_max_tail)
        if on_batch_done is not None:
            on_batch_done(
                {
                    "batch_id": bid,
                    "version": version,
                    "wall_sec": round(_time.time() - _t0, 3),
                    "index_tail_entries": index_t.tail_entry_count(),
                }
            )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if trigger_once:
        q.awaitTermination()
    return index_t
