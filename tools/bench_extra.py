"""Round-7 optimization harness: noop-sink isolation per query (guide
§1.4) plus pipeline-stage breakdowns. Does NOT replace bench.py (frozen);
numbers here are for optimization evidence in OPTIMIZATION_r07.md.

Usage:
  python tools/bench_extra.py queries [sf_dir] [n_trials]
  python tools/bench_extra.py images  [sf_dir]
  python tools/bench_extra.py compare [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HEADLINE = [
    "q10_knn",
    "q09_radius_join",
    "q11_match_categories",
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q08_variant_dedup",
]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_noop(spark, df, label: str, trials: int = 3) -> list[float]:
    spark.sparkContext.setJobDescription(label)
    out = []
    for _ in range(trials):
        t0 = time.time()
        noop(df)
        out.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    return out


def bench_queries(sf_dir: str, trials: int) -> None:
    from gtfs_osm_sync_spark.session import get_spark
    from gtfs_osm_sync_spark import driver_queries as dq

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app_name="bench_extra")
    # warm JIT/codegen once
    noop(dq.QUERIES[HEADLINE[0]](spark, sf_dir))
    res = {}
    for name in HEADLINE:
        df = dq.QUERIES[name](spark, sf_dir)
        ts = time_noop(spark, df, f"extra:{name}", trials)
        res[name] = {"samples": ts, "min": min(ts)}
        print(name, ts, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "noop_queries": res}))


def bench_images(sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from gtfs_osm_sync_spark.session import get_spark
    from gtfs_osm_sync_spark import synth
    from gtfs_osm_sync_spark.pipeline import assign_images

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app_name="bench_extra_images")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    n_img = max(int(1_000_000 * sf), 20_000)
    geo = synth.generate_geo_only(spark, n_img, partitions=cpus * 4)
    feats = synth.generate_features(spark, n_img, max(n_img // 50, 8))

    # stage breakdown: generator alone, then full pipeline
    gen_ts = time_noop(spark, geo, "images:gen_only", 3)
    print("gen_only", gen_ts, flush=True)
    out = assign_images(geo, feats)
    full_ts = time_noop(spark, out, "images:assign_full", 3)
    print("assign_full", full_ts, flush=True)
    print(
        json.dumps(
            {
                "n_images": n_img,
                "gen_only_min": min(gen_ts),
                "assign_full_min": min(full_ts),
            }
        )
    )


def bench_compare(sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from gtfs_osm_sync_spark.session import get_spark
    from gtfs_osm_sync_spark import synth
    from gtfs_osm_sync_spark.operators.compare import compare_stops

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app_name="bench_extra_compare")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    n_stops = max(int(2_000_000 * sf), 10_000)
    stops, nodes = synth.generate_compare_world(spark, n_stops, partitions=cpus * 2)
    stops = stops.localCheckpoint()
    nodes = nodes.localCheckpoint()

    cmp = compare_stops(
        stops,
        nodes,
        agency_names=[synth.COMPARE_AGENCY],
        id_digits=synth._CMP_DIGITS,
        broadcast_stops=n_stops <= 100_000,
    )
    ts = time_noop(spark, cmp, "compare:full", 3)
    print("compare_full", ts, flush=True)
    print(json.dumps({"n_stops": n_stops, "compare_full_min": min(ts)}))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    if mode == "queries":
        bench_queries(sf_dir, trials)
    elif mode == "images":
        bench_images(sf_dir)
    elif mode == "compare":
        bench_compare(sf_dir)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
