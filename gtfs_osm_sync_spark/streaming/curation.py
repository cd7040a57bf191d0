"""Incremental image curation over a stream of image micro-batches.

Batch curation (operators/images.py curate_images — the g15 pipeline)
assumes the whole corpus is visible at once. A crawler does not work
that way: images arrive continuously, and re-running the full pipeline
per drop is the same wrong plan the incremental stop↔node sync
(streaming/sync.py) exists to avoid. This module keeps curation
incremental:

  image micro-batches (file source / availableNow)
    -> ONE decode pass per batch (image_features: luma stats + real
       DCT phash64) + the same quality gates as curate_images
    -> WITHIN-batch near-dup fold: pigeonhole banding + connected
       components over the batch only (O(batch), never the corpus)
    -> CROSS-batch near-dup fold: the batch canonicals' bit-bands
       equi-join the ACCEPTED-BANDS log — the banding invariant
       (Hamming <= n_bands-1 implies >= 1 exact shared band) makes the
       accepted log probe-able by hash join on (band, band_val), so a
       batch of k images probes O(k * n_bands) keys, never scans
       accepted x batch pairs; exact popcount verifies candidates
    -> survivors append to three SnapTables: curated rows (+shard),
       their bands (the probe index the NEXT batch joins), and folds
       (provenance: image_id -> dup_of, the row it duplicated)

Canonical choice is FIRST-WINS across batches (an accepted image is
never revoked by a later near-duplicate; within one batch, min
image_id — the batch pipeline's rule). This is the standard streaming
deviation from batch CC's global-min rule and is pinned as such in
tests/test_streaming_curation.py: group STRUCTURE equals the batch
pipeline's components; the elected survivor differs exactly when a
group's min id arrives after another member.

Scale shape: per-batch work is O(batch) decode + O(batch * n_bands)
probe keys against the bands log. For batches up to
probe_pushdown_limit distinct band values, the batch's band keys are
collected (bounded: O(batch * n_bands), the same contract as the
sync's touched-id lookup) and pushed into the log scan as an
In(band_val, ...) predicate; the bands log is written with parquet
bloom filters on band_val (SnapTable write_options, the same machinery
as the node log's osm_id point-lookups), so the reader skips every row
group whose bloom filter rejects all probed band keys — row-group
point lookups instead of a full-log column pass. Wider batches fall
back to the plain hash join (full log scan, still never
accepted x batch pairs); nothing per batch shuffles anything
proportional to the accepted corpus.

Crash consistency: the three appends are separate atomic commits, each
effectively-once under its own (run_id, batch_id) ledger — a replayed
micro-batch after a crash re-appends only the tables it had not
reached. Replay is self-safe: a batch whose bands ARE already
committed but whose curated rows are not would see its own bands in
the probe — the join excludes same-id matches, so re-processing is
idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import banded_signatures, connected_components, simhash_pairs
from ..operators.images import image_features
from ..sources.snaptable import SnapTable, bloom_filter_options

N_BANDS = 4
BAND_BITS = 16


def _gated_features(batch: DataFrame, bright_lo, bright_hi, min_contrast,
                    min_caption_tokens) -> DataFrame:
    """curate_images' stage 1+2 on one micro-batch."""
    return image_features(batch).filter(
        F.col("brightness").between(bright_lo, bright_hi)
        & (F.col("contrast") >= min_contrast)
        & (F.size(F.split(F.col("caption"), r"\s+")) >= min_caption_tokens)
    )


def curate_batch(
    ok: DataFrame,
    accepted_bands: DataFrame | None,
    max_hamming: int = 3,
    n_shards: int = 16,
    probe_pushdown_limit: int = 8192,
):
    """One micro-batch through within-batch + cross-batch dedup.

    ok             gated feature rows of THIS batch (will be consumed
                   several times — caller persists)
    accepted_bands (image_id, phash64, band, band_val) of everything
                   accepted so far, or None for the first batch

    probe_pushdown_limit: batches with at most this many distinct band
    values get their keys pushed into the accepted-log scan as an
    In(band_val, ...) predicate (collected driver-side — bounded,
    O(batch * n_bands)); with the bands log written under
    bloom_filter_options(["band_val"]) the parquet reader then answers
    the probe with row-group point lookups. 0 keeps the plain hash
    join for every batch. The filter keys on band_val alone (ignoring
    the band ordinal) — a superset of the true (band, band_val) probe
    set, so the join's result is unchanged.

    Returns (survivors, folds): survivors carry the curated schema
    (+n_dups, shard); folds are (image_id, dup_of, hamming) where
    dup_of is the CLOSEST accepted match (min Hamming, ties to the
    smallest accepted id) so the reported pair is consistent.
    """
    # -- within batch: the batch pipeline's exact machinery ------------
    pairs = simhash_pairs(
        ok.select("image_id", "phash64"),
        max_hamming=max_hamming,
        id_col="image_id",
        sig_col="phash64",
        n_bands=N_BANDS,
        band_bits=BAND_BITS,
    )
    comp = connected_components(pairs, id_a="id_a", id_b="id_b")
    with_comp = ok.join(
        comp.withColumnRenamed("doc_id", "image_id"), "image_id", "left"
    ).withColumn("canonical", F.coalesce("component", "image_id"))
    canonicals = with_comp.filter(F.col("canonical") == F.col("image_id"))
    members = with_comp.filter(F.col("canonical") != F.col("image_id"))

    # -- cross batch: banded probe of the accepted log -----------------
    if accepted_bands is not None:
        probe = banded_signatures(
            canonicals.select("image_id", "phash64"),
            id_col="image_id",
            sig_col="phash64",
            n_bands=N_BANDS,
            band_bits=BAND_BITS,
        )
        if probe_pushdown_limit:
            # bounded driver collect (O(batch * n_bands) keys, the same
            # contract as the sync's touched-id lookup): pushed as an In
            # predicate, the accepted-log scan becomes row-group point
            # lookups under the band_val bloom filter
            keys = [
                r["band_val"]
                for r in probe.select("band_val")
                .distinct()
                .limit(probe_pushdown_limit + 1)
                .collect()
            ]
            if len(keys) <= probe_pushdown_limit:
                accepted_bands = accepted_bands.filter(
                    F.col("band_val").isin(keys)
                )
        acc = accepted_bands.select(
            F.col("band"),
            F.col("band_val"),
            F.col("image_id").alias("acc_id"),
            F.col("phash64").alias("acc_sig"),
        )
        cross = (
            probe.join(acc, ["band", "band_val"])
            .filter(F.col("acc_id") != F.col("image_id"))
            .withColumn(
                "hamming",
                F.bit_count(F.col("phash64").bitwiseXOR(F.col("acc_sig"))),
            )
            .filter(F.col("hamming") <= max_hamming)
            # one consistent (dup_of, hamming) pair per folded canonical:
            # the closest accepted match, ties to the smallest accepted id
            # (independent min(acc_id)/min(hamming) could mix rows)
            .groupBy("image_id")
            .agg(F.min(F.struct("hamming", "acc_id")).alias("_m"))
            .select(
                "image_id",
                F.col("_m.acc_id").alias("dup_of"),
                F.col("_m.hamming").alias("hamming"),
            )
        )
    else:
        cross = None

    if cross is not None:
        folded_canon = cross
        survivors = canonicals.join(cross.select("image_id"), "image_id", "left_anti")
    else:
        folded_canon = None
        survivors = canonicals

    # n_dups = batch-local members folded behind each surviving canonical
    sizes = members.groupBy("canonical").agg(F.count("*").alias("_n")).select(
        F.col("canonical").alias("_canon"), "_n"
    )
    survivors = (
        survivors.drop("component", "canonical")
        .join(sizes, F.col("image_id") == F.col("_canon"), "left")
        .withColumn("n_dups", F.coalesce(F.col("_n"), F.lit(0)).cast("int"))
        .drop("_canon", "_n")
        .withColumn("shard", F.pmod(F.xxhash64("image_id"), F.lit(n_shards)).cast("int"))
    )

    # folds: batch members chase their canonical's fate; folded canonicals
    # record the accepted row they duplicated
    member_folds = members.select(
        "image_id", F.col("canonical").alias("_via")
    )
    if folded_canon is not None:
        member_folds = member_folds.join(
            folded_canon.select(
                F.col("image_id").alias("_via"), F.col("dup_of").alias("_target")
            ),
            "_via",
            "left",
        )
        canon_folds = folded_canon.select(
            "image_id", F.col("dup_of"), F.col("hamming")
        )
    else:
        member_folds = member_folds.withColumn("_target", F.lit(None).cast("string"))
        canon_folds = None
    member_folds = member_folds.select(
        "image_id",
        F.coalesce("_target", "_via").alias("dup_of"),
        F.lit(None).cast("int").alias("hamming"),
    )
    folds = (
        member_folds.unionByName(canon_folds)
        if canon_folds is not None
        else member_folds
    )
    return survivors, folds


def stream_curate_images(
    spark: SparkSession,
    source_dir: str,
    root: str,
    schema,
    run_id: str = "curate",
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
    max_files_per_trigger: int | None = None,
    bright_lo: float = 112.0,
    bright_hi: float = 143.0,
    min_contrast: float = 8.0,
    min_caption_tokens: int = 3,
    max_hamming: int = 3,
    n_shards: int = 16,
    probe_pushdown_limit: int = 8192,
    compact_max_tail: int | None = 64,
    on_batch_done=None,
):
    """Start (and with trigger_once, drain) the incremental curation
    stream. Tables under root: curated/, bands/, folds/ (SnapTables).

    checkpoint_dir is REQUIRED (same data-loss rationale as
    streaming/ingest.py: batch ids are only durable with a streaming
    checkpoint, and the effectively-once skip keys on them).

    compact_max_tail: the SnapTable.maybe_compact cadence applied to all
    three tables after each batch's appends — without it the bands log
    (re-read every micro-batch as the cross-batch probe index) grows one
    manifest entry per batch forever, degrading footer/plan cost even
    though the probe itself stays bloom/In-bounded (VERDICT r5 #3).
    Compaction goes through SnapTable._writer, so the band_val bloom
    filter write options hold across rewrites. None disables.

    on_batch_done: optional callback(dict) fired after each batch's
    commits (bench/observability seam; keys: batch_id, wall_sec,
    bands_tail_entries)."""
    if not checkpoint_dir:
        raise ValueError(
            "checkpoint_dir is required: without a durable streaming "
            "checkpoint, batch_id restarts at 0 on re-run and the "
            "effectively-once ledger would skip fresh batches (data loss)"
        )
    curated_t = SnapTable(root + "/curated")
    bands_t = SnapTable(root + "/bands",
                        write_options=bloom_filter_options(["band_val"]))
    folds_t = SnapTable(root + "/folds")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        _t0 = _time.time()
        bid = int(batch_id)
        done_curated = bid in curated_t.processed_chunks(run_id)
        done_bands = bid in bands_t.processed_chunks(run_id)
        done_folds = bid in folds_t.processed_chunks(run_id)
        if done_curated and done_bands and done_folds:
            return  # fully replayed micro-batch
        ok = _gated_features(
            batch_df, bright_lo, bright_hi, min_contrast, min_caption_tokens
        ).localCheckpoint()  # one decode pass; consumed by several branches
        acc = (
            bands_t.read(spark)
            if bands_t.snapshot() is not None
            else None
        )
        survivors, folds = curate_batch(
            ok, acc, max_hamming=max_hamming, n_shards=n_shards,
            probe_pushdown_limit=probe_pushdown_limit,
        )
        survivors = survivors.localCheckpoint()  # bounded: O(batch)
        cp = {"run_id": run_id, "chunks": [bid], "source": "stream"}
        if not done_curated:
            curated_t.append(survivors.withColumn("batch_id", F.lit(bid)), checkpoint=cp)
        if not done_bands:
            bands_t.append(
                banded_signatures(
                    survivors.select("image_id", "phash64"),
                    id_col="image_id",
                    sig_col="phash64",
                    n_bands=N_BANDS,
                    band_bits=BAND_BITS,
                ),
                checkpoint=cp,
            )
        if not done_folds:
            folds_t.append(folds.withColumn("batch_id", F.lit(bid)), checkpoint=cp)
        if compact_max_tail is not None:
            # after the ledgered appends: compaction is content-preserving,
            # so a crash anywhere around it replays exactly as before
            for t in (curated_t, bands_t, folds_t):
                t.maybe_compact(spark, max_tail=compact_max_tail)
        if on_batch_done is not None:
            on_batch_done(
                {
                    "batch_id": bid,
                    "wall_sec": round(_time.time() - _t0, 3),
                    "bands_tail_entries": bands_t.tail_entry_count(),
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
    return q
