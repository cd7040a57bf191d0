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

What is intentionally NOT reproduced (unneeded by the engine's call
sites): hidden partition transforms, schema evolution, position/equality
delete files, and compaction — on Iceberg those come for free after the
swap.
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


@dataclass
class Snapshot:
    version: int
    files: list[str]
    checkpoint: dict[str, Any] | None
    parent: int | None
    ts: float
    operation: str


class SnapTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

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
        )

    def snapshots(self) -> list[Snapshot]:
        out = []
        v = 1
        while os.path.exists(self._manifest_path(v)):
            out.append(self.snapshot(v))
            v += 1
        return out

    def _commit(self, files: list[str], checkpoint: dict | None, operation: str) -> int:
        parent = self.current_version()
        version = parent + 1
        manifest = {
            "version": version,
            "parent": parent or None,
            "files": files,
            "checkpoint": checkpoint,
            "ts": time.time(),
            "operation": operation,
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

    def append(self, df: DataFrame, checkpoint: dict | None = None) -> int:
        """Atomic append; returns the new snapshot version."""
        token = uuid.uuid4().hex[:12]
        staging = os.path.join(self.root, f"_staging_{token}")
        df.write.mode("overwrite").parquet(staging)
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
        return self._commit(files, checkpoint, "append")

    def rollback(self, version: int) -> int:
        """Roll the table back to `version` (new snapshot, old file list) —
        the engine's changeset-revert (reference RevertChangeset.java:47-78)."""
        snap = self.snapshot(version)
        if snap is None:
            raise ValueError(f"no snapshot v{version}")
        return self._commit(snap.files, {"rollback_of": version}, "rollback")

    # -- read -------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        snap = self.snapshot(version)
        if snap is None or not snap.files:
            raise ValueError("table is empty")
        paths = [os.path.join(self.root, f) for f in snap.files]
        return spark.read.parquet(*paths)

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
