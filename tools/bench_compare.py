"""Compare-pipeline scaling evidence: the REFERENCE'S core task (stop vs
node categorize + tag merge) on the synthetic compare world at two
taskset-pinned parallelism levels (same methodology as bench_scaling.py:
per-level fresh JVM, <= 12 busy cores, best-of-3).

The reference runs this as an O(N*M) nested Vincenty loop on one JVM
(CompareData.java:1016-1069); this engine plans it as broadcast hash
joins (id match + cell-prejoin conflict probe), so per-stop work is
O(candidates in ring), independent of the node count.

Appends a section to BENCH/BASELINE.md and prints one JSON line.

Usage: python tools/bench_compare.py [n_stops] [cpus_lo] [cpus_hi]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, math, sys, time
sys.path.insert(0, {repo!r})
from gtfs_osm_sync_spark.session import get_spark
from gtfs_osm_sync_spark import synth
from gtfs_osm_sync_spark.operators.compare import compare_stops
import pyspark.sql.functions as F

cpus = {cpus}
n = {n_stops}
scale = math.sqrt(max(n / 100_000, 1.0))
spark = get_spark(cpus=cpus, shuffle_partitions=cpus * 4,
                  app_name=f"bench_compare_{{cpus}}",
                  extra_conf={{"spark.local.dir": f"/dev/shm/bc_{{cpus}}",
                              "spark.sql.parquet.compression.codec": "uncompressed",
                              "spark.sql.join.preferSortMergeJoin": "false"}})
stage = {stage_dir!r}
stops = spark.read.parquet(stage + "/stops")
nodes = spark.read.parquet(stage + "/nodes")

def run():
    cmp = compare_stops(stops, nodes, agency_names=[synth.COMPARE_AGENCY],
                        id_digits=synth._CMP_DIGITS,
                        broadcast_stops=False)  # 1M stops: the shuffle path
    return cmp.agg(F.sum(F.hash("gtfs_id", "category", "osm_id")),
                   F.count("*")).collect()[0]

run()  # warm-up (JVM/codegen/Arrow)
best = float("inf")
for _ in range(3):
    t0 = time.time()
    row = run()
    best = min(best, time.time() - t0)
print("RESULT " + json.dumps({{"cpus": cpus, "n_stops": n, "rows": row[1],
                              "sec": round(best, 2),
                              "stops_per_sec": round(n / best, 1)}}))
"""

_STAGER = r"""
import math, sys
sys.path.insert(0, {repo!r})
from gtfs_osm_sync_spark.session import get_spark
from gtfs_osm_sync_spark import synth
n = {n_stops}
scale = math.sqrt(max(n / 100_000, 1.0))
spark = get_spark(shuffle_partitions=32,
                  extra_conf={{"spark.local.dir": "/dev/shm/bc_stage"}})
stops, nodes = synth.generate_compare_world(spark, n, spread_scale=scale,
                                            partitions=32)
stops.write.mode("overwrite").parquet({stage_dir!r} + "/stops")
nodes.write.mode("overwrite").parquet({stage_dir!r} + "/nodes")
print("STAGED")
"""


def _run(code: str, cpus: int | None, timeout: int = 1800) -> str:
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
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    return out.stdout + ("" if out.returncode == 0 else "\nSTDERR:\n" + out.stderr[-3000:])


def main() -> None:
    n_stops = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    stage = "/dev/shm/bench_compare" if os.path.isdir("/dev/shm") else "/tmp/bench_compare"
    t0 = time.time()
    out = _run(_STAGER.format(repo=REPO, n_stops=n_stops, stage_dir=stage), None)
    if "STAGED" not in out:
        raise RuntimeError(f"staging failed:\n{out[-3000:]}")
    results = {}
    try:
        for cpus in (lo, hi):
            out = _run(
                _CHILD.format(repo=REPO, cpus=cpus, n_stops=n_stops, stage_dir=stage), cpus
            )
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results[cpus] = json.loads(line[len("RESULT "):])
                    break
            else:
                raise RuntimeError(f"no RESULT at {cpus} cores:\n{out[-3000:]}")
    finally:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
    eff = round(
        (results[hi]["stops_per_sec"] / results[lo]["stops_per_sec"]) / (hi / lo), 3
    )
    summary = {
        "metric": "compare-pipeline scaling (stop-vs-node categorize + tag merge)",
        "n_stops": n_stops,
        "low": results[lo],
        "high": results[hi],
        "scaling_efficiency_compare": eff,
        "wall_sec": round(time.time() - t0, 1),
    }
    section = f"""

## Compare-pipeline scaling (the reference's core task, round 2)

Synthetic compare world ({n_stops:,} stops x ~{int(n_stops * 1.07):,} nodes,
all five category modes planted; categories brute-force-verified at 2k in
tests/test_compare_world.py). Same methodology as above (taskset {lo} vs
{hi} cores, fresh JVM per level, best of 3).

| cores | stops/sec | wall (s) |
|---|---|---|
| {lo} | {results[lo]['stops_per_sec']:,} | {results[lo]['sec']} |
| {hi} | {results[hi]['stops_per_sec']:,} | {results[hi]['sec']} |

Scaling efficiency {lo} -> {hi} cores: **{eff}** (target >= 0.8).
The reference's own algorithm is O(stops x nodes) serial Vincenty
(CompareData.java:1016-1069) — at this world size that is ~10^12 distance
evaluations; the engine's hash-join plan computes ~{results[hi]['rows']:,}
categorized rows in {results[hi]['sec']} s at {hi} cores.

```json
{json.dumps(summary, indent=2)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(section)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
