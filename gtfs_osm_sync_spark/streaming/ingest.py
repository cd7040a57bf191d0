"""Streaming ingestion into the images table (stretch goal per SURVEY
§2.9: `foreachBatch` into the snapshot table).

The reference has no streaming at all (one-shot SwingWorker batch,
task/CompareData.java:1388-1445); the north rule asks for resumable
batch. This module exists so a user with a *continuous* image feed can
land micro-batches with the same atomic-commit + lineage semantics:

    readStream (file source of raw image parquet drops)
      -> geotag (same fused UDF as batch)
      -> foreachBatch: SnapTable.append(batch, checkpoint={batch_id})

foreachBatch + SnapTable gives effectively-once appends: a replayed
micro-batch (after a crash) is detected via the batch_id recorded in the
commit checkpoint and skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.spatial_join import geotag_images
from ..sources.snaptable import SnapTable


def stream_images_to_table(
    spark: SparkSession,
    source_dir: str,
    table_root: str,
    schema,
    run_id: str = "stream",
    trigger_once: bool = True,
    checkpoint_dir: str | None = None,
):
    """Start (and with trigger_once=True, drain) a file-source stream that
    geotags incoming image rows and appends them atomically.

    checkpoint_dir is REQUIRED: Spark's batch_id restarts at 0 without a
    checkpoint, so a re-run with the same run_id would find batch 0 in the
    ledger and silently skip never-ingested files. The effectively-once
    skip is only sound when batch ids are durable.

    Returns the StreamingQuery (already stopped if trigger_once).
    """
    if not checkpoint_dir:
        raise ValueError(
            "checkpoint_dir is required: without a durable streaming "
            "checkpoint, batch_id restarts at 0 on re-run and the "
            "effectively-once ledger would skip fresh batches (data loss)"
        )
    table = SnapTable(table_root)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        done = table.processed_chunks(run_id)
        if int(batch_id) in done:
            return  # replayed micro-batch after restart: effectively-once
        geo = geotag_images(batch_df)
        table.append(
            geo,
            checkpoint={
                "run_id": run_id,
                "chunks": [int(batch_id)],
                "rows_out": batch_df.count(),
                "source": "stream",
            },
        )

    reader = spark.readStream.schema(schema).parquet(source_dir)
    writer = reader.writeStream.foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if trigger_once:
        q.awaitTermination()
    return q
