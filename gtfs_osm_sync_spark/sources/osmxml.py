"""OSM XML source (SURVEY §2.1 S6/S7 made concrete on real data).

The reference parses OSM XML with SAX handlers into node/way/relation
lists (tools/parser/BusStopParser.java:33-161, RouteParser.java:34-159).
Here the same data lands as DataFrames:

- `read_osm_xml`: ONE streaming parse per file into a unified
  element frame (elem_type + nullable per-type fields). Files fan out
  across tasks (OSM extracts ship as many regional files; planet-scale
  inputs are pre-split the same way), and each file parses in O(1)
  memory via ElementTree.iterparse + elem.clear(). Parse once, filter
  many: nodes/ways/relations are column-pruned FILTERS over the parsed
  frame, not re-parses.
- `ways_with_geo`: way lat/lon = the first <nd>'s node coordinates
  (J10; BusStopParser.java:62-66,116-133 wayNodeMap/endDocument) — a
  hash equi-join on the first nd ref, not a lookup loop.
- `standalone_features`: the compare pipeline's feature set = nodes NOT
  swallowed by any way (anti-join on exploded way nds, keeping
  public_transport=platform nodes) UNION ways-with-geo
  (BusStopParser.java:110-153).
- `resolve_members`: relation members gain lat/lon from their referenced
  node (or their way's first nd) and the referenced element's
  public_transport value (RouteParser.java:121-147) — the input F13's
  role rewrite needs.

`elem_idx` preserves document order per file: the reference's sequential
scan gives first-in-file-wins semantics wherever two elements compete
(CompareData.java:1060-1075 noUpload guard), so downstream operators
order by (file_idx, elem_idx) instead of inheriting partition luck.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OSM_ELEMENT_SCHEMA = T.StructType(
    [
        T.StructField("elem_type", T.StringType()),
        T.StructField("osm_id", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("version", T.StringType()),
        T.StructField("user", T.StringType()),
        T.StructField("uid", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("changeset", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("nds", T.ArrayType(T.StringType())),
        T.StructField(
            "members",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("ref", T.StringType()),
                        T.StructField("mtype", T.StringType()),
                        T.StructField("role", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("file_idx", T.IntegerType()),
        T.StructField("elem_idx", T.LongType()),
    ]
)

_TOP = ("node", "way", "relation")


def _parse_one(path: str, file_idx: int) -> Iterator[tuple]:
    """Stream one OSM XML file; yields unified element tuples in document
    order. iterparse end-events see complete children; clearing each
    top-level element keeps memory flat regardless of file size."""
    elem_idx = 0
    for _, elem in ET.iterparse(path, events=("end",)):
        if elem.tag not in _TOP:
            continue
        a = elem.attrib
        tags = {t.get("k"): t.get("v") for t in elem.findall("tag")}
        nds = [n.get("ref") for n in elem.findall("nd")] if elem.tag == "way" else None
        members = (
            [(m.get("ref"), m.get("type"), m.get("role")) for m in elem.findall("member")]
            if elem.tag == "relation"
            else None
        )
        yield (
            elem.tag,
            a.get("id"),
            float(a["lat"]) if "lat" in a else None,
            float(a["lon"]) if "lon" in a else None,
            a.get("version"),
            a.get("user"),
            a.get("uid"),
            a.get("timestamp"),
            a.get("changeset"),
            tags,
            nds,
            members,
            file_idx,
            elem_idx,
        )
        elem_idx += 1
        elem.clear()


def read_osm_xml(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Parse OSM XML file(s) into the unified element frame.

    One task per file; each file streams. Filter with osm_nodes /
    osm_ways / osm_relations (plan-time projections, no re-parse)."""
    if isinstance(paths, str):
        paths = [paths]
    files = spark.createDataFrame(
        [(p, i) for i, p in enumerate(paths)], "path string, file_idx int"
    ).repartition(max(len(paths), 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in OSM_ELEMENT_SCHEMA]
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = list(_parse_one(row["path"], int(row["file_idx"])))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, OSM_ELEMENT_SCHEMA)


def osm_nodes(elements: DataFrame) -> DataFrame:
    return elements.filter(F.col("elem_type") == "node").drop(
        "elem_type", "nds", "members"
    )


def osm_ways(elements: DataFrame) -> DataFrame:
    return elements.filter(F.col("elem_type") == "way").drop(
        "elem_type", "lat", "lon", "members"
    )


def osm_relations(elements: DataFrame) -> DataFrame:
    return elements.filter(F.col("elem_type") == "relation").drop(
        "elem_type", "lat", "lon", "nds"
    )


def ways_with_geo(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J10: each way gains lat/lon from its FIRST <nd>'s node
    (BusStopParser.java:62-66 firstNodeRefOfWay, endDocument:116-133).

    Expressed as an equi-join on element_at(nds, 1); the node side is
    pruned to (id, lat, lon). At scale both sides hash-partition on the
    ref — no driver maps."""
    first_nd = ways.withColumn("first_nd", F.element_at("nds", 1))
    node_geo = nodes.select(
        F.col("osm_id").alias("first_nd"),
        F.col("lat").alias("nd_lat"),
        F.col("lon").alias("nd_lon"),
    )
    return (
        first_nd.join(node_geo, "first_nd", "left")
        .withColumn("lat", F.col("nd_lat"))
        .withColumn("lon", F.col("nd_lon"))
        .drop("nd_lat", "nd_lon")
    )


def standalone_features(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """The compare pipeline's OSM feature set (BusStopParser.java:110-153):
    nodes referenced by some way are 'swallowed' into the way and removed,
    UNLESS tagged public_transport=platform; ways join in with first-nd
    geometry. Returns a node/way union with a `feature_type` column.

    Plan: explode(nds) -> distinct refs -> LEFT ANTI join (the swallowed-
    node anti-join, J10's second half). The exploded ref set is one narrow
    column; the anti-join is a hash join on osm_id."""
    way_refs = (
        ways.select(F.explode("nds").alias("osm_id"))
        .distinct()
        .withColumn("_in_way", F.lit(True))
    )
    keep = F.col("tags").getItem("public_transport") == "platform"
    # one LEFT join replaces an anti + semi pair (two scans, two joins):
    # a node survives if no way references it OR it is a platform
    surviving = (
        nodes.join(way_refs, "osm_id", "left")
        .filter(F.col("_in_way").isNull() | keep)
        .drop("_in_way")
    )
    node_feats = surviving.withColumn("feature_type", F.lit("node")).withColumn(
        "nds", F.lit(None).cast(T.ArrayType(T.StringType()))
    )
    way_feats = (
        ways_with_geo(ways, nodes)
        .withColumn("feature_type", F.lit("way"))
        .drop("first_nd")
    )
    return node_feats.unionByName(way_feats.select(*node_feats.columns))


def resolve_members(
    relations: DataFrame, nodes: DataFrame, ways: DataFrame
) -> DataFrame:
    """J8 input: one row per (relation, member) with the member's lat/lon
    resolved from its node (or its way's first nd) and the referenced
    element's public_transport value (RouteParser.java:121-147).

    explode(members) -> two left joins (nodes by ref; ways-with-geo by
    ref) -> coalesce. All equi-joins."""
    m = relations.select(
        F.col("osm_id").alias("relation_id"),
        "version",
        "tags",
        F.posexplode("members").alias("member_pos", "m"),
    ).select(
        "relation_id",
        "version",
        "tags",
        "member_pos",
        F.col("m.ref").alias("ref"),
        F.col("m.mtype").alias("mtype"),
        F.col("m.role").alias("role"),
    )
    node_side = nodes.select(
        F.col("osm_id").alias("ref"),
        F.col("lat").alias("n_lat"),
        F.col("lon").alias("n_lon"),
        F.col("tags").getItem("public_transport").alias("n_pt"),
    )
    way_side = ways_with_geo(ways, nodes).select(
        F.col("osm_id").alias("ref"),
        F.col("lat").alias("w_lat"),
        F.col("lon").alias("w_lon"),
        F.col("tags").getItem("public_transport").alias("w_pt"),
    )
    return (
        m.join(node_side, "ref", "left")
        .join(way_side, "ref", "left")
        .withColumn("member_lat", F.coalesce("n_lat", "w_lat"))
        .withColumn("member_lon", F.coalesce("n_lon", "w_lon"))
        .withColumn("ref_public_transport", F.coalesce("n_pt", "w_pt"))
        .drop("n_lat", "n_lon", "n_pt", "w_lat", "w_lon", "w_pt")
    )


def api_version_supported(capabilities_xml: str, api_version: str = "0.6") -> bool:
    """F18: OSM API capabilities version gate
    (tools/parser/OsmVersionParser.java:29-49): the server's
    <version minimum= maximum=> range must contain our API version.
    Driver-side scalar — it gates a session, not data."""
    import io

    for _, elem in ET.iterparse(io.StringIO(capabilities_xml), events=("end",)):
        if elem.tag == "version" and elem.get("minimum") is not None:
            lo = float(elem.get("minimum"))
            hi = float(elem.get("maximum"))
            return lo <= float(api_version) <= hi
    return False
