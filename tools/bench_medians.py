"""Run bench.py N times (default 3) and print per-query MEDIANS.

A single bench sample on this host carries several-percent clock drift
(BENCH/BASELINE.md); round-over-round comparisons of BENCH_r{N}.json
need medians to distinguish a real plan regression from host noise.

Usage: python tools/bench_medians.py [n_trials] [sf_dir] [cpus]
Prints one JSON line: {"n": n, "medians": {...}, "samples": [...]}
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=cpus)
    samples = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        samples.append(json.loads(line))
    meds: dict = {}
    for q in samples[0]["queries"]:
        meds[q] = round(statistics.median(s["queries"][q] for s in samples), 3)
    meds["headline_value"] = round(statistics.median(s["value"] for s in samples), 3)
    for k in ("flagship_images", "compare_pipeline"):
        if k in samples[0]:
            key = "images_per_sec" if k == "flagship_images" else "stops_per_sec"
            meds[k] = round(statistics.median(s[k][key] for s in samples), 1)
    print(json.dumps({"n": n, "sf_dir": sf_dir, "cpus": cpus, "medians": meds,
                      "samples": [s["queries"] | {"value": s["value"]} for s in samples]}))


if __name__ == "__main__":
    main()
