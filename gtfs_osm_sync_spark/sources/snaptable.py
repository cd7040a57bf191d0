"""SnapTable: an atomic-snapshot parquet table with a checkpoint ledger.

The Iceberg runtime jars are not available in this container, so this
module provides the Iceberg *semantics* the north_rule needs on plain
parquet + JSON manifests (same design family as Iceberg's metadata
tree — implemented from the published table-format concepts, not any
proprietary code):

- append(df, checkpoint=...)  — ACID append: data files land first, then
  a new manifest (listing the full file set) is written, then the
  `_current` pointer flips via os.replace (atomic on POSIX). A reader
  never sees a partial commit; a killed writer leaves only orphan files.
- checkpoint ledger IN the manifest — the per-partition lineage+metrics
  rows ride in the same atomic commit as the data they describe, which
  is what makes mid-run kill + resume exact (SURVEY §7 hard part 5).
- snapshots() / rollback(version) / time_travel(version) — the revert
  pipeline (reference §3.3: download changeset, invert, re-upload,
  HttpRequest.java:260-299) collapses to a metadata pointer flip.

On a real cluster this class is replaced by `df.writeTo(tbl).append()`
on an Iceberg catalog; the engine call sites only use the four methods
above, so the swap is local to this file. Mechanism-by-mechanism, the
deliberate seam is:

  SnapTable mechanism                Iceberg equivalent
  ---------------------------------  ----------------------------------
  data-files-then-manifest write     manifest / manifest-list write
  `_current` pointer os.replace      catalog atomic swap of
                                       metadata.json pointer
                                       (TableMetadata commit)
  manifest lists FULL file set       snapshot = full manifest list
                                       (no log replay needed)
  checkpoint ledger rows in          snapshot summary properties /
    the manifest                       commit metadata riding the same
                                       atomic commit
  snapshots()                        table.snapshots metadata table
  rollback(version)                  rollback_to_snapshot(id)
  time_travel(version)               VERSION AS OF / snapshot-id read
  orphan files from killed writer    uncommitted data files, removed
                                       by remove_orphan_files
  write_options in the manifest      table write properties (e.g.
    (bloom_filter_options)             write.parquet.bloom-filter-
                                       enabled.column.X)
  tail_entry_count()                 manifest-list entries since the
                                       last rewrite (maintenance metric)
  maybe_compact(max_tail)            scheduled rewrite_data_files
                                       maintenance trigger

Partitioned layout + compaction (round 5): a table opened with
`partition_by="cell_part"` writes every append hive-partitioned by that
column (each append is an immutable `data/<token>/cell_part=X/...`
tree recorded as one manifest entry), and `compact()` rewrites the
current contents into a fresh partitioned BASE snapshot.  `read_split`
then hands callers (base, tail): the base scan is partition-prunable
(`filter(col(part).isin(...))` becomes `PartitionFilters` — real I/O
skipping), while the tail (appends since the last compaction) is small
and must be read in full by merge-on-read consumers — any base row
superseded after compaction has its superseding row in the tail, so
pruning the base can never resurrect a stale row.  Iceberg equivalents:
hidden-partition data files + `rewrite_data_files` compaction + the
manifest-level partition-summary pruning a planner does for free.

What is intentionally NOT reproduced (unneeded by the engine's call
sites): hidden partition transforms, schema evolution, and
position/equality delete files — on Iceberg those come for free after
the swap.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def bloom_filter_options(cols: list[str], ndv: int | None = None) -> dict[str, str]:
    """Parquet write options enabling a split-block bloom filter on each
    named column (Iceberg: `write.parquet.bloom-filter-enabled.column.X`).
    On a point-lookup-heavy log (the node log's osm_id), the reader skips
    whole row groups whose bloom filter rejects every probed id — the
    at-scale complement to partition pruning for NON-partition-key
    lookups. `ndv` sizes the filter (expected distinct values per row
    group); omitted, parquet's dynamic sizing applies."""
    out = {f"parquet.bloom.filter.enabled#{c}": "true" for c in cols}
    if ndv is not None:
        out.update({f"parquet.bloom.filter.expected.ndv#{c}": str(ndv) for c in cols})
    return out


@dataclass
class Snapshot:
    version: int
    files: list[str]
    checkpoint: dict[str, Any] | None
    parent: int | None
    ts: float
    operation: str
    base_files: list[str] | None = None
    partition_by: str | None = None
    write_options: dict[str, str] | None = None


class SnapTable:
    def __init__(
        self,
        root: str,
        partition_by: str | None = None,
        write_options: dict[str, str] | None = None,
    ):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)
        stored = self._stored_partition_by()
        if partition_by and stored and partition_by != stored:
            raise ValueError(
                f"table {root} is partitioned by {stored!r}, not {partition_by!r}"
            )
        if partition_by and stored is None and not self.is_empty():
            raise ValueError(
                f"table {root} already has flat (unpartitioned) commits; "
                "compact() a fresh table instead of mixing layouts"
            )
        # the layout is a TABLE property, recorded in every manifest: a
        # re-open without the constructor arg inherits it, so mixed
        # flat/partitioned appends cannot happen by accident
        self.partition_by = partition_by or stored
        # write_options (e.g. bloom_filter_options) are likewise a table
        # property (Iceberg write properties): persisted per manifest and
        # inherited on re-open, so every writer lays files out the same
        # way; an explicit arg overrides for subsequent commits
        s = self.snapshot()
        self.write_options = (
            write_options if write_options is not None
            else (s.write_options if s else None)
        )

    def _stored_partition_by(self) -> str | None:
        s = self.snapshot()
        return s.partition_by if s else None

    # -- metadata ---------------------------------------------------------

    @property
    def _current_path(self) -> str:
        return os.path.join(self.root, "_current")

    def current_version(self) -> int:
        try:
            with open(self._current_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version:06d}.json")

    def snapshot(self, version: int | None = None) -> Snapshot | None:
        v = self.current_version() if version is None else version
        if v <= 0:
            return None
        with open(self._manifest_path(v)) as f:
            d = json.load(f)
        return Snapshot(
            version=d["version"],
            files=d["files"],
            checkpoint=d.get("checkpoint"),
            parent=d.get("parent"),
            ts=d["ts"],
            operation=d.get("operation", "append"),
            base_files=d.get("base_files"),
            partition_by=d.get("partition_by"),
            write_options=d.get("write_options"),
        )

    def snapshots(self) -> list[Snapshot]:
        out = []
        v = 1
        while os.path.exists(self._manifest_path(v)):
            out.append(self.snapshot(v))
            v += 1
        return out

    def _commit(
        self,
        files: list[str],
        checkpoint: dict | None,
        operation: str,
        base_files: list[str] | None = None,
    ) -> int:
        parent = self.current_version()
        version = parent + 1
        manifest = {
            "version": version,
            "parent": parent or None,
            "files": files,
            "checkpoint": checkpoint,
            "ts": time.time(),
            "operation": operation,
            "base_files": base_files,
            "partition_by": self.partition_by,
            "write_options": self.write_options,
        }
        tmp = self._manifest_path(version) + f".tmp{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path(version))
        tmp2 = self._current_path + f".tmp{uuid.uuid4().hex[:8]}"
        with open(tmp2, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp2, self._current_path)  # the atomic commit point
        return version

    # -- write ------------------------------------------------------------

    def _writer(self, df: DataFrame):
        """df.write with the table's persisted write_options applied —
        every commit path (append flat/tree, compact) goes through here
        so file layout knobs (bloom filters, row-group sizing) hold for
        the table's whole lifetime regardless of which writer commits."""
        w = df.write.mode("overwrite")
        if self.write_options:
            w = w.options(**self.write_options)
        return w

    def _write_tree(self, df: DataFrame, token: str) -> str:
        """Write df as one immutable hive-partitioned tree under data/,
        returning its manifest-relative path. Same atomicity shape as the
        flat path: data lands in staging, one os.replace publishes it."""
        staging = os.path.join(self.root, f"_staging_{token}")
        self._writer(df).partitionBy(self.partition_by).parquet(staging)
        dst = os.path.join(self.data_dir, token)
        os.replace(staging, dst)
        return os.path.join("data", token)

    def append(self, df: DataFrame, checkpoint: dict | None = None) -> int:
        """Atomic append; returns the new snapshot version."""
        token = uuid.uuid4().hex[:12]
        if self.partition_by:
            new_files = [self._write_tree(df, token)]
        else:
            staging = os.path.join(self.root, f"_staging_{token}")
            self._writer(df).parquet(staging)
            new_files = []
            for name in sorted(os.listdir(staging)):
                if not name.endswith(".parquet"):
                    continue
                dst_name = f"{token}-{name}"
                os.replace(
                    os.path.join(staging, name), os.path.join(self.data_dir, dst_name)
                )
                new_files.append(os.path.join("data", dst_name))
            shutil.rmtree(staging, ignore_errors=True)
        prev = self.snapshot()
        files = (prev.files if prev else []) + new_files
        base = prev.base_files if prev else None
        return self._commit(files, checkpoint, "append", base_files=base)

    def compact(self, spark: SparkSession, reducer=None, checkpoint: dict | None = None) -> int:
        """Rewrite the current contents into a fresh BASE snapshot
        (Iceberg rewrite_data_files): one immutable tree, partitioned by
        `partition_by` when set, becomes the table's entire file list and
        its `base_files`. `reducer` (optional fn(df) -> df) lets the
        caller fold history down before the rewrite — e.g. the node log
        keeps only the latest row per osm_id. Prior snapshots keep their
        file lists, so time travel/rollback across the compaction still
        works; superseded files are orphaned, not deleted (Iceberg's
        expire_snapshots is the analogous maintenance op)."""
        df = self.read(spark)
        if reducer is not None:
            df = reducer(df)
        token = uuid.uuid4().hex[:12]
        if self.partition_by:
            rel = self._write_tree(df, token)
        else:
            staging = os.path.join(self.root, f"_staging_{token}")
            self._writer(df).parquet(staging)
            dst = os.path.join(self.data_dir, token)
            os.replace(staging, dst)
            rel = os.path.join("data", token)
        return self._commit([rel], checkpoint, "compact", base_files=[rel])

    def tail_entry_count(self) -> int:
        """Manifest entries (flat files or partitioned append trees)
        accumulated since the last compaction base — the driver of
        read-plan cost: a partitioned table unions ONE scan per tree
        (see _read_paths), a flat table adds one footer per file."""
        s = self.snapshot()
        if s is None:
            return 0
        base = set(s.base_files or [])
        return sum(1 for f in s.files if f not in base)

    def maybe_compact(
        self,
        spark: SparkSession,
        max_tail: int = 64,
        reducer=None,
        checkpoint: dict | None = None,
    ) -> int | None:
        """Compaction cadence: compact() once the tail since the last
        base exceeds `max_tail` manifest entries, else no-op (returns
        None). This is the documented read-cost contract for append-heavy
        tables (streaming logs): a long-running appender that calls this
        after each commit keeps read()'s plan O(max_tail) in append count
        instead of linear since table creation. Amortized write cost is
        O(table/max_tail) per append. Iceberg equivalent: a scheduled
        rewrite_data_files maintenance job."""
        if self.tail_entry_count() <= max_tail:
            return None
        return self.compact(spark, reducer=reducer, checkpoint=checkpoint)

    def rollback(self, version: int) -> int:
        """Roll the table back to `version` (new snapshot, old file list) —
        the engine's changeset-revert (reference RevertChangeset.java:47-78)."""
        snap = self.snapshot(version)
        if snap is None:
            raise ValueError(f"no snapshot v{version}")
        return self._commit(
            snap.files, {"rollback_of": version}, "rollback",
            base_files=snap.base_files,
        )

    # -- read -------------------------------------------------------------

    def _read_paths(self, spark: SparkSession, files: list[str]) -> DataFrame:
        paths = [os.path.join(self.root, f) for f in files]
        # mergeSchema: the union schema is taken across every file, so a
        # column added by a later writer (e.g. hex_cell stamped on new
        # node-log appends) deterministically appears as NULL on
        # pre-upgrade rows instead of depending on which footer Spark
        # samples (ADVICE r4). Footer-read cost is per-file metadata only.
        rd = spark.read.option("mergeSchema", "true")
        if not self.partition_by or len(paths) == 1:
            return rd.parquet(*paths)
        # each partitioned append is its own hive root: Spark requires
        # one root per read (a single basePath scan rejects the
        # non-key=value token segment with CONFLICTING_DIRECTORY_
        # STRUCTURES), so read per-root and union — a partition-column
        # filter still prunes every scan independently. The union chain
        # grows one scan per append since the last compaction, so
        # long-running appenders MUST hold the maybe_compact() cadence
        # contract to keep this plan bounded (ADVICE r5).
        out = rd.parquet(paths[0])
        for p in paths[1:]:
            out = out.unionByName(rd.parquet(p), allowMissingColumns=True)
        return out

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        snap = self.snapshot(version)
        if snap is None or not snap.files:
            raise ValueError("table is empty")
        return self._read_paths(spark, snap.files)

    def read_split(
        self, spark: SparkSession, version: int | None = None
    ) -> tuple[DataFrame | None, DataFrame | None]:
        """(base, tail) views of the snapshot: base = the latest
        compaction's files (hive-partitioned when partition_by is set, so
        a filter on the partition column becomes PartitionFilters — the
        scan skips non-matching partitions' I/O entirely); tail = every
        append since. Merge-on-read contract: a caller that prunes the
        base MUST read the tail in full — every base row superseded after
        compaction has its superseding row in the tail, so full-tail +
        pruned-base can never resurrect a stale row. Either side is None
        when empty (no compaction yet -> base None, files all tail)."""
        snap = self.snapshot(version)
        if snap is None or not snap.files:
            raise ValueError("table is empty")
        base = snap.base_files or []
        tail = [f for f in snap.files if f not in set(base)]
        base_df = self._read_paths(spark, base) if base else None
        tail_df = self._read_paths(spark, tail) if tail else None
        return base_df, tail_df

    def is_empty(self) -> bool:
        s = self.snapshot()
        return s is None or not s.files

    # -- checkpoint ledger --------------------------------------------------

    def processed_chunks(self, run_id: str) -> set[int]:
        """All chunk ids committed for run_id across the snapshot chain."""
        done: set[int] = set()
        for s in self.snapshots():
            cp = s.checkpoint or {}
            if cp.get("run_id") == run_id:
                done.update(cp.get("chunks", []))
        return done

    def checkpoint_metrics(self, run_id: str) -> list[dict]:
        out = []
        for s in self.snapshots():
            cp = s.checkpoint or {}
            if cp.get("run_id") == run_id:
                out.append(cp)
        return out
