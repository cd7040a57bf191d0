"""Route/variant operators (SURVEY §2.4 A3-A8, §2.3 J7/J11).

The reference builds RouteVariants by replaying stop_times rows in file
order into TreeMaps (io/GTFSReadIn.java:409-483) and matches GTFS routes
to OSM relations with a 3-tier scored loop (task/CompareData.java:920-995).
Here every step is a groupBy/window:

- stop_to_routes (A3): stop -> distinct routes set + route_ref string.
- route_variants (A4+A5): trip -> sequence-sorted stop array; identical
  (stop_id, pickup, drop_off) sequences collapse to one variant whose id
  is the smallest trip_id (RouteVariant.java:123-126 equality).
- variant_summary (A6+A7): first/last stop, 'Bus <ref>: <from> => <to>'
  name, HH:MM duration (RouteVariant.java:128-180).
- scored_route_match (J7): tiered equi-joins unioned with score
  1000/900/600/300 and the tie-decrement, best per trip by window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.mappings import duration_hhmm


def stop_to_routes(stop_times: DataFrame, trips: DataFrame) -> DataFrame:
    """A3+A8+J11: per stop, the distinct routes serving it and the sorted
    ';'-joined route_ref string (GTFSReadIn.java:531-562,633-646; lexical
    order pinned per SURVEY §4)."""
    st = stop_times.join(F.broadcast(trips), "trip_id")
    return st.groupBy("stop_id").agg(
        F.sort_array(F.collect_set("route_id")).alias("routes"),
        F.concat_ws(";", F.sort_array(F.collect_set("route_id"))).alias("route_ref"),
    )


def route_variants(stop_times: DataFrame, trips: DataFrame) -> DataFrame:
    """A4+A5: sequence-sorted per-trip stop arrays, collapsed to variants.

    variant identity = md5 of the ordered (stop_id, pickup, drop_off)
    projection (RouteVariantStop.java:64-92 equality fields); the variant
    keeps min(trip_id) as its id and the full trip list as
    same_trip_sequences (GTFSReadIn.java:384-407).
    """
    seq = (
        stop_times.groupBy("trip_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("stop_sequence", "stop_id", "pickup_type", "drop_off_type",
                             "arrival_time", "departure_time")
                )
            ).alias("stops")
        )
        .withColumn(
            "variant_sig",
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.col("stops"),
                        lambda s: F.concat_ws(
                            ",",
                            s["stop_id"],
                            s["pickup_type"].cast("string"),
                            s["drop_off_type"].cast("string"),
                        ),
                    ),
                )
            ),
        )
    )
    seq = seq.join(F.broadcast(trips), "trip_id")
    return seq.groupBy("route_id", "variant_sig").agg(
        F.min("trip_id").alias("variant_id"),
        F.sort_array(F.collect_list("trip_id")).alias("same_trip_sequences"),
        F.count("*").alias("n_trips"),
        # representative stops array = the min-trip_id trip's, matching
        # variant_id. F.first would be nondeterministic: trips in one
        # variant share (stop_id,pickup,drop_off) but NOT arrival times,
        # so first() made the times (and duration) partition-order luck.
        F.min_by(F.col("stops"), F.col("trip_id")).alias("stops"),
    )


def variant_summary(variants: DataFrame, routes: DataFrame | None = None) -> DataFrame:
    """A6+A7: from/to/name/duration per variant (RouteVariant.java:128-180).

    duration = last arrival - first departure, formatted %02d:%02d
    (RouteVariant.java:157-180). Times are GTFS 'HH:mm:ss' strings that
    may exceed 24h; parsed arithmetically, not with to_timestamp.
    """
    first = F.element_at(F.col("stops"), 1)
    last = F.element_at(F.col("stops"), -1)

    def hms_to_sec(c):
        p = F.split(c, ":")
        return (
            F.element_at(p, 1).cast("long") * 3600
            + F.element_at(p, 2).cast("long") * 60
            + F.element_at(p, 3).cast("long")
        )

    out = variants.select(
        "route_id",
        "variant_id",
        "n_trips",
        "same_trip_sequences",
        first["stop_id"].alias("from_stop"),
        last["stop_id"].alias("to_stop"),
        F.size("stops").alias("n_stops"),
        duration_hhmm(
            hms_to_sec(first["departure_time"]), hms_to_sec(last["arrival_time"])
        ).alias("duration"),
    )
    if routes is not None and "route_ref" in routes.columns:
        out = out.join(
            F.broadcast(routes.select("route_id", "route_ref")), "route_id", "left"
        ).withColumn(
            "variant_name",
            F.format_string(
                "Bus %s: %s => %s",
                F.col("route_ref"),
                F.col("from_stop"),
                F.col("to_stop"),
            ),
        )
    return out


def scored_route_match(
    gtfs_trips: DataFrame,
    osm_relations: DataFrame,
    tiers: tuple[tuple[str, str, int], ...] = (
        ("trip_id", "rel_trip_id", 1000),
        ("variant_sig", "rel_variant_sig", 900),
        ("route_id", "rel_route_id", 600),
        ("route_ref", "rel_route_ref", 300),
    ),
) -> DataFrame:
    """J7: the reference's scored relation match (CompareData.java:920-995):
    trip-id match 1000, same sequence family 900-n, route match 600-n,
    short-name match 300-n; n is the tie-decrement within (trip, tier)
    (CompareData.java:383-385,967-981); best relation per trip wins.

    gtfs_trips needs the left tier key columns; osm_relations the right
    ones plus rel_id. Tier joins are broadcast (relations are the small
    side by construction).
    """
    rel = F.broadcast(osm_relations)
    parts = []
    for left_key, right_key, score in tiers:
        if left_key not in gtfs_trips.columns or right_key not in osm_relations.columns:
            continue
        j = gtfs_trips.join(rel, F.col(left_key) == F.col(right_key)).select(
            "trip_id", "rel_id", F.lit(score).alias("tier")
        )
        parts.append(j)
    tiered = parts[0]
    for p in parts[1:]:
        tiered = tiered.unionByName(p)
    w_tier = W.partitionBy("trip_id", "tier").orderBy("rel_id")
    scored = tiered.withColumn(
        "score", F.col("tier") - (F.row_number().over(w_tier) - 1)
    )
    w_best = W.partitionBy("trip_id").orderBy(F.desc("score"), F.asc("rel_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("trip_id", "rel_id", "score")
    )


def build_route_relations(
    variants: DataFrame,
    nodes: DataFrame | None = None,
    operator_full: str = "",
    mode: str = "bus",
    id_digits: int = 0,
) -> DataFrame:
    """The route-upload composition (compareRouteData,
    task/CompareData.java:615-690): one OSM route relation per variant —
    members are the variant's stops IN SEQUENCE ORDER, each resolved to
    its OSM node by gtfs_id when one exists (negative position-based temp
    id otherwise, CompareData.java:641-650), with the PTv2 role from
    pickup/drop_off (F12, CompareData.java:653-662) rewritten against the
    referenced node's public_transport value (F13,
    RelationMember.java:60-82). Output feeds sinks.osm_change_xml
    directly (primitive_type='relation', members, tags).

    Plan: posexplode(stops) -> one hash equi-join against the node layer's
    (gtfs_id -> osm_id, public_transport) projection -> re-assemble with
    array_sort(collect_list(struct(pos, ...))) — the same keyed
    collect_list shape as route_variants itself.
    """
    from ..functions.mappings import (
        pickup_dropoff_to_role,
        rewrite_member_role,
        zero_pad_id,
    )

    ex = variants.select(
        "route_id",
        "variant_id",
        F.posexplode("stops").alias("pos", "s"),
    ).select(
        "route_id",
        "variant_id",
        "pos",
        F.col("s.stop_id").alias("stop_id"),
        pickup_dropoff_to_role(F.col("s.pickup_type"), F.col("s.drop_off_type")).alias(
            "role"
        ),
    )
    if nodes is not None:
        node_map = nodes.filter(F.col("tags").getItem("gtfs_id").isNotNull()).select(
            (
                zero_pad_id(F.col("tags").getItem("gtfs_id"), id_digits)
                if id_digits
                else F.col("tags").getItem("gtfs_id")
            ).alias("stop_id"),
            F.col("osm_id").alias("node_osm_id"),
            F.col("tags").getItem("public_transport").alias("ref_pt"),
        ).dropDuplicates(["stop_id"])
        ex = ex.join(F.broadcast(node_map), "stop_id", "left")
    else:
        ex = ex.withColumn("node_osm_id", F.lit(None).cast("string")).withColumn(
            "ref_pt", F.lit(None).cast("string")
        )
    ex = ex.withColumn(
        "member_ref",
        F.coalesce(F.col("node_osm_id"), (-(F.col("pos") + 1)).cast("string")),
    ).withColumn("final_role", rewrite_member_role(F.col("role"), F.col("ref_pt")))
    rel = ex.groupBy("route_id", "variant_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", "member_ref", "final_role")
                )
            ),
            lambda m: F.struct(
                m["member_ref"].alias("ref"),
                F.lit("node").alias("mtype"),
                m["final_role"].alias("role"),
            ),
        ).alias("members")
    )
    tags = F.create_map(
        F.lit("type"), F.lit("route"),
        F.lit("route"), F.lit(mode),
        F.lit("network"), F.lit(operator_full),
        F.lit("ref"), F.col("route_id"),
        F.lit("name"), F.concat(F.lit(operator_full), F.lit(" route "), F.col("route_id")),
        F.lit("gtfs:route_id"), F.col("route_id"),
        F.lit("gtfs:trip_id:sample"), F.col("variant_id"),
    )
    return rel.select(
        F.col("variant_id").alias("osm_id"),
        F.col("route_id"),
        F.lit("relation").alias("primitive_type"),
        F.lit(None).cast("double").alias("lat"),
        F.lit(None).cast("double").alias("lon"),
        F.lit(None).cast("string").alias("version"),
        tags.alias("tags"),
        F.lit(None).cast("array<string>").alias("nds"),
        F.col("members"),
    )
