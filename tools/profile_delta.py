"""Stage-by-stage profile of the delta-sync variants (dev tool, not a
recorded bench): where do delta_r5's seconds actually go vs delta_r4?

Usage: python tools/profile_delta.py [n_stops] [cpus]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from gtfs_osm_sync_spark import synth  # noqa: E402
from gtfs_osm_sync_spark.functions.cells import make_hex_cell_udf  # noqa: E402
from gtfs_osm_sync_spark.functions.mappings import zero_pad_id  # noqa: E402
from gtfs_osm_sync_spark.operators.compare import compare_stops  # noqa: E402
from gtfs_osm_sync_spark.operators.spatial_join import HEX_RES  # noqa: E402
from gtfs_osm_sync_spark.session import get_spark  # noqa: E402
from gtfs_osm_sync_spark.streaming.sync import (  # noqa: E402
    COARSE_RES,
    affected_stop_ids,
    coarse_partition_cells,
    prune_state_to_stop_rings,
    stamp_feed_cells,
)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
stage = "/dev/shm/profile_delta"

spark = get_spark(cpus=cpus, shuffle_partitions=cpus * 4,
                  extra_conf={"spark.local.dir": "/dev/shm/pd_local",
                              "spark.sql.join.preferSortMergeJoin": "false"})

T0 = time.time()


def tick(label, t0):
    dt = time.time() - t0
    print(f"  {label:<42s} {dt:7.2f}s", flush=True)
    return time.time()


scale = math.sqrt(max(n / 100_000, 1.0))
stops, nodes = synth.generate_compare_world(spark, n, spread_scale=scale,
                                            partitions=32)
stamped = stamp_feed_cells(stops)
(stamped.write.mode("overwrite").partitionBy("cell_part")
 .parquet(stage + "/stops_part"))
stamped.drop("cell_part").write.mode("overwrite").parquet(stage + "/stops_flat")
nodes.write.mode("overwrite").parquet(stage + "/nodes")
print(f"staged in {time.time() - T0:.1f}s", flush=True)

stops_part = spark.read.parquet(stage + "/stops_part")
stops_flat = spark.read.parquet(stage + "/stops_flat")
nodes = spark.read.parquet(stage + "/nodes")
n_nodes = nodes.count()
feed_ids = stops_part.select("gtfs_id").cache()
feed_ids.count()

hexc = make_hex_cell_udf(HEX_RES)
coarse = make_hex_cell_udf(COARSE_RES)

k = 100
step = max(n_nodes // k, 1)
idnum = F.substring("osm_id", 2, 12).cast("long")
moved = (nodes.filter(idnum % step == 0)
         .withColumn("lat", F.col("lat") + F.lit(0.0009)))
kept = nodes.join(moved.select("osm_id"), "osm_id", "left_anti")
state_path = stage + "/state_k100"
(kept.unionByName(moved)
 .withColumn("hex_cell", hexc("lat", "lon"))
 .withColumn("cell_part", coarse("lat", "lon"))
 .write.mode("overwrite").partitionBy("cell_part").parquet(state_path))
changed0 = (nodes.join(moved.select("osm_id"), "osm_id", "left_semi")
            .select("lat", "lon")
            .unionByName(moved.select("lat", "lon"))
            .localCheckpoint())
print(f"state staged, k={moved.count()}", flush=True)


def consume(df):
    return df.agg(F.sum(F.hash("gtfs_id", "category", "osm_id")),
                  F.count("*")).collect()[0]


def shrink_known(ids_base, st):
    raw = F.col("tags").getItem("gtfs_id")
    node_ids = (st.filter(raw.isNotNull() & (raw != "missing"))
                .select(zero_pad_id(raw, synth._CMP_DIGITS)
                        .alias("gtfs_id")).distinct())
    return ids_base.select("gtfs_id").join(
        F.broadcast(node_ids), "gtfs_id", "left_semi")


def profile_r5(tag, coalesce=None):
    print(f"[{tag}] delta_r5 stages (coalesce={coalesce}):", flush=True)
    t = time.time()
    cells = coarse_partition_cells(changed0)
    t = tick(f"coarse_partition_cells(changed) n={len(cells)}", t)
    feed = stops_part.filter(F.col("cell_part").isin(cells))
    feed.count()
    t = tick("pruned feed scan count", t)
    touched = affected_stop_ids(feed, changed0)
    sub = feed.join(F.broadcast(touched), "gtfs_id", "left_semi")
    if coalesce:
        sub = sub.coalesce(coalesce)
    sub = sub.localCheckpoint()
    t = tick(f"sub build+checkpoint nparts={sub.rdd.getNumPartitions()}", t)
    n_sub = sub.count()
    t = tick(f"sub.count = {n_sub}", t)
    vals = coarse_partition_cells(sub)
    t = tick(f"coarse_partition_cells(sub) n={len(vals)}", t)
    st_raw = spark.read.parquet(state_path).filter(F.col("cell_part").isin(vals))
    st = prune_state_to_stop_rings(st_raw, sub)
    if coalesce:
        st = st.coalesce(coalesce)
    st = st.localCheckpoint()
    t = tick(f"pruned state build+checkpoint nparts={st.rdd.getNumPartitions()}", t)
    known = shrink_known(feed_ids, st)
    known.count()
    t = tick("known shrink count", t)
    row = consume(compare_stops(sub, st, agency_names=[synth.COMPARE_AGENCY],
                                id_digits=synth._CMP_DIGITS, known_ids=known))
    t = tick(f"compare consume rows={row[1]}", t)


def profile_r4(tag):
    print(f"[{tag}] delta_r4 stages:", flush=True)
    t = time.time()
    touched = affected_stop_ids(stops_flat, changed0)
    sub = stops_flat.join(F.broadcast(touched), "gtfs_id",
                          "left_semi").localCheckpoint()
    t = tick(f"sub build+checkpoint (flat) nparts={sub.rdd.getNumPartitions()}", t)
    n_sub, nf = sub.count(), stops_flat.count()
    t = tick(f"counts sub={n_sub} feed={nf}", t)
    vals = coarse_partition_cells(sub)
    st_raw = spark.read.parquet(state_path).filter(F.col("cell_part").isin(vals))
    st = prune_state_to_stop_rings(st_raw, sub).localCheckpoint()
    t = tick(f"pruned state build+checkpoint nparts={st.rdd.getNumPartitions()}", t)
    known = shrink_known(stops_flat, st)
    known.count()
    t = tick("known shrink count (flat feed)", t)
    row = consume(compare_stops(sub, st, agency_names=[synth.COMPARE_AGENCY],
                                id_digits=synth._CMP_DIGITS, known_ids=known))
    t = tick(f"compare consume rows={row[1]}", t)


profile_r5("warm")
profile_r5("run")
profile_r5("warm-c", coalesce=cpus)
profile_r5("run-c", coalesce=cpus)
profile_r4("warm")
profile_r4("run")

import shutil

shutil.rmtree(stage, ignore_errors=True)
shutil.rmtree("/dev/shm/pd_local", ignore_errors=True)
print(f"total {time.time() - T0:.1f}s")
