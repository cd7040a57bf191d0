"""Streaming-curation sustained-run evidence (VERDICT r5 item 8).

Claim under test: per-batch wall stays FLAT as the accepted log grows.
The cross-batch probe is O(batch * n_bands) keys against the bands log
(In-pushdown + bloom point lookups), and round 6's compact_max_tail
cadence bounds the log's manifest entries — so batch k should cost what
batch 2 cost, not grow with the accepted corpus.

Method: stage n_batches equal-size image drops (each batch also carries
near-dup plants of the PREVIOUS batch's originals, so the cross-batch
fold path stays exercised), run stream_curate_images availableNow with
maxFilesPerTrigger=1 in a fresh taskset-pinned JVM, and record each
micro-batch's wall + the bands log's tail size via the on_batch_done
seam. First two batches are JIT/plan warm-up; the statistic of record
is the max/min ratio over batches 2..n ("flatness") plus the raw
series.

Writes BENCH/stream_curate.json (rendered into BENCH/BASELINE.md by
tools/bench_scaling.regen_md) and prints one JSON line.

Usage: python tools/bench_stream_curate.py [n_batches] [batch_size] [cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_STAGER = r"""
import sys
sys.path.insert(0, {repo!r})
import pyspark.sql.functions as F
from gtfs_osm_sync_spark.session import get_spark
from gtfs_osm_sync_spark import synth
nb, m = {n_batches}, {batch_size}
spark = get_spark(shuffle_partitions=32,
                  extra_conf={{"spark.local.dir": "/dev/shm/bsc_stage"}})
allrows = synth.generate_images_with_dups(spark, nb * m).cache()
num = F.substring("image_id", 4, 12).cast("long")
is_dup = F.col("image_id").startswith("dup")
for k in range(nb):
    lo, hi = k * m, (k + 1) * m
    b = allrows.filter(
        (~is_dup & num.between(lo, hi - 1))
        | (is_dup & num.between(lo - m, lo - 1))
    )
    # ONE file per drop: the file source triggers one micro-batch per
    # FILE under maxFilesPerTrigger=1, so multi-file drops would give
    # uneven batch sizes and a meaningless flatness statistic
    b.coalesce(1).write.mode("overwrite").parquet(
        {stage_dir!r} + f"/drops/b{{k:02d}}.parquet")
print("STAGED")
"""

_CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from gtfs_osm_sync_spark import synth
from gtfs_osm_sync_spark.session import get_spark
from gtfs_osm_sync_spark.streaming.curation import stream_curate_images

spark = get_spark(shuffle_partitions={cpus},
                  extra_conf={{"spark.local.dir": "/dev/shm/bsc_child"}})
stats = []
stream_curate_images(
    spark, {stage_dir!r} + "/drops/*", {stage_dir!r} + "/cur",
    synth.IMAGES_SCHEMA, checkpoint_dir={stage_dir!r} + "/ckpt",
    max_files_per_trigger=1, compact_max_tail={compact_max_tail},
    on_batch_done=stats.append,
)
from gtfs_osm_sync_spark.sources.snaptable import SnapTable
bands = SnapTable({stage_dir!r} + "/cur/bands")
curated = SnapTable({stage_dir!r} + "/cur/curated")
out = dict(
    batches=stats,
    n_accepted=curated.read(spark).count(),
    bands_rows=bands.read(spark).count(),
    bands_tail_entries=bands.tail_entry_count(),
    bands_compactions=sum(1 for s in bands.snapshots()
                          if s.operation == "compact"),
)
print("RESULT " + json.dumps(out))
"""


def _run(code: str, cpus: int | None, timeout: int = 3600) -> str:
    env = dict(os.environ)
    env.update(
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
        NUMEXPR_NUM_THREADS="1",
    )
    cmd = [sys.executable, "-c", code]
    if cpus is not None and os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env
    )
    return out.stdout + ("" if out.returncode == 0 else "\nSTDERR:\n" + out.stderr[-3000:])


def _result(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT:\n{out[-3000:]}")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    stage = "/dev/shm/bench_scur" if os.path.isdir("/dev/shm") else "/tmp/bench_scur"
    t0 = time.time()
    out = _run(
        _STAGER.format(repo=REPO, n_batches=n_batches, batch_size=batch_size,
                       stage_dir=stage),
        None,
    )
    if "STAGED" not in out:
        raise RuntimeError(f"staging failed:\n{out[-3000:]}")
    try:
        res = _result(
            _run(
                _CHILD.format(repo=REPO, cpus=cpus, stage_dir=stage,
                              compact_max_tail=8),
                cpus,
            )
        )
    finally:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
    walls = [b["wall_sec"] for b in res["batches"]]
    # first two batches are JVM/JIT/plan warm-up; the claim is about the
    # steady state as the accepted log keeps growing
    steady = walls[2:] if len(walls) > 4 else walls
    build = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    summary = {
        "metric": "streaming image curation: per-batch wall vs accepted-log growth",
        "build": build,
        "cpus": cpus,
        "n_batches": n_batches,
        "batch_size": batch_size,
        "compact_max_tail": 8,
        "batch_walls_sec": walls,
        "steady_min_sec": min(steady),
        "steady_max_sec": max(steady),
        "steady_flatness": round(max(steady) / min(steady), 2),
        "first_vs_last": round(walls[-1] / walls[2], 2) if len(walls) > 3 else None,
        "bands_tail_entries_series": [b["bands_tail_entries"] for b in res["batches"]],
        "n_accepted": res["n_accepted"],
        "bands_rows": res["bands_rows"],
        "bands_compactions": res["bands_compactions"],
        "wall_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(REPO, "BENCH", "stream_curate.json"), "w") as f:
        json.dump(summary, f, indent=2)
    import bench_scaling  # noqa: PLC0415 — same tools/ dir

    bench_scaling.regen_md()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
