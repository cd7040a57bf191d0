"""OSM XML source (SURVEY §2.1 S6/S7 made concrete on real data).

The reference parses OSM XML with SAX handlers into node/way/relation
lists (tools/parser/BusStopParser.java:33-161, RouteParser.java:34-159).
Here the same data lands as DataFrames:

- `read_osm_xml`: ONE streaming parse per file into a unified
  element frame (elem_type + nullable per-type fields). Files fan out
  across tasks, and each file parses in O(1) memory via
  ElementTree.iterparse + elem.clear() + root child pruning (clearing
  alone leaves one empty shell per element under the root). Parse once,
  filter many: nodes/ways/relations are column-pruned FILTERS over the
  parsed frame, not re-parses.
- `split_bytes=N` fans ONE large file out across ceil(size/N) tasks by
  byte range: each task scans forward to the first top-level element
  boundary (`<node`/`<way`/`<relation` + delimiter — attribute values
  XML-escape '<', so a raw byte scan cannot false-positive) at/after
  its range start and parses elements starting before the next chunk's
  boundary. Chunk peak memory = O(split_bytes). `elem_idx` under split
  is byte-offset-based: order-consistent with document order (what
  doc_order consumers need), not dense.
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


def _emit(source, file_idx: int, idx_of) -> Iterator[tuple]:
    """Shared iterparse loop: yields unified element tuples in document
    order. Each finished top-level element is cleared AND detached from
    the root (clear() alone leaves an empty shell per element under the
    root — O(#elements) growth on a planet-scale file)."""
    root = None
    local = 0
    for event, elem in ET.iterparse(source, events=("start", "end")):
        if event == "start":
            if root is None:
                root = elem
            continue
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
            idx_of(local),
        )
        local += 1
        elem.clear()
        if root is not None:
            del root[:]  # at a top-level end no sibling is in progress


def _parse_one(path: str, file_idx: int) -> Iterator[tuple]:
    """Stream one whole OSM XML file in O(1) memory."""
    return _emit(path, file_idx, lambda i: i)


_BOUNDARY_TAGS = (b"<node", b"<way", b"<relation")
_OVERLAP = 10  # > len('<relation') == len('<![CDATA[') + 1 delimiter byte
# regions whose content must not be mistaken for element boundaries
_SKIP_REGIONS = ((b"<!--", b"-->"), (b"<![CDATA[", b"]]>"))


_BACKSCAN = 1 << 16  # how far before pos a region opener is visible


def _find_boundary(f, pos: int, tags: tuple = _BOUNDARY_TAGS) -> int | None:
    """First byte offset >= pos where a top-level element starts (may be
    up to 2 bytes earlier when a skip-region closer straddles pos; the
    function is deterministic per pos, so adjacent chunks' end/start
    scans always agree and the chunk slices still tile exactly). A raw
    byte scan is sound because '<' inside attribute values is always
    XML-escaped; child tags (<tag/<nd/<member) share no prefix with the
    top-level names once the delimiter byte is checked. A literal
    '<node'/'<way'/'<relation' inside an XML comment or CDATA section is
    NOT a boundary: regions opening at/after pos are tracked forward,
    and a region already open AT pos is detected by a bounded backward
    scan (last opener/closer token in the _BACKSCAN window before pos).
    Residual hole: a single comment/CDATA region longer than _BACKSCAN
    (64 KB) straddling pos, or pathological token nesting inside such
    regions — machine-generated OSM dumps carry neither; for hand-edited
    extracts use split_bytes=None (a mis-sliced chunk that fails to
    parse raises a ValueError pointing there; see _parse_range)."""
    skip_end = None  # close-marker of an open comment/CDATA region
    seed = b""
    if pos > 0:
        lo = max(0, pos - _BACKSCAN)
        f.seek(lo)
        win = f.read(pos - lo)
        last = None  # (offset, closer-if-opener-else-None)
        for opener, closer in _SKIP_REGIONS:
            j = win.rfind(opener)
            if j >= 0 and (last is None or j > last[0]):
                last = (j, closer)
            j = win.rfind(closer)
            if j >= 0 and (last is None or j > last[0]):
                last = (j, None)
        if last is not None and last[1] is not None:
            skip_end = last[1]
            seed = win[-2:]  # a 3-byte closer may straddle pos
    f.seek(pos)
    tail = seed
    base = pos - len(seed)
    while True:
        block = f.read(1 << 20)
        buf = tail + block
        eof = not block
        limit = len(buf) if eof else len(buf) - _OVERLAP
        i = 0
        while i < limit:
            if skip_end is not None:
                e = buf.find(skip_end, i)
                if e < 0 or e + len(skip_end) > limit:
                    i = limit  # region continues into the next block
                    break
                i = e + len(skip_end)
                skip_end = None
                continue
            # earliest special token at/after i: a delimited boundary
            # tag or a comment/CDATA opener (which wins if earlier)
            cands = []
            for t in tags:
                j = buf.find(t, i)
                while 0 <= j < limit:
                    nxt = buf[j + len(t) : j + len(t) + 1]
                    if nxt == b"" or nxt in b" \t\r\n>/":
                        cands.append((j, t, None))
                        break
                    j = buf.find(t, j + 1)
            for opener, closer in _SKIP_REGIONS:
                j = buf.find(opener, i)
                if 0 <= j < limit:
                    cands.append((j, opener, closer))
            if not cands:
                i = limit
                break
            j, tok, closer = min(cands)
            if closer is None:
                return base + j
            skip_end = closer
            i = j + len(tok)
        if eof:
            return None
        keep = min(len(buf), _OVERLAP)
        tail = buf[len(buf) - keep :]
        base += len(buf) - keep


def _parse_range(path: str, file_idx: int, start: int, end: int) -> Iterator[tuple]:
    """Parse the top-level elements whose start boundary falls in
    [start, end): scan to the first boundary at/after start, slice up to
    the first boundary at/after end (elements are complete by
    construction — the next boundary is the next element's start), wrap
    in a synthetic <osm> root. Peak memory = the chunk slice."""
    import io
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        b0 = _find_boundary(f, start)
        if b0 is None or b0 >= end:
            return
        b1 = _find_boundary(f, end) if end < size else None
        f.seek(b0)
        data = f.read((b1 if b1 is not None else size) - b0)
    if b1 is None:
        k = data.rfind(b"</osm>")
        if k >= 0:
            data = data[:k]
    src = io.BytesIO(b"<osm>" + data + b"</osm>")
    # byte-offset-based elem_idx: strictly increasing across chunks
    # (local count can never reach the next chunk's start offset — every
    # element is > 1 byte), dense within none
    try:
        yield from _emit(src, file_idx, lambda i: b0 + i)
    except ET.ParseError as ex:
        raise ValueError(
            f"byte-range chunk [{start},{end}) of {path} failed to parse "
            f"({ex}). If this file contains an XML comment or CDATA "
            "section spanning a chunk boundary, the boundary scan can "
            "mis-slice it — re-read with split_bytes=None."
        ) from ex


def read_osm_xml(
    spark: SparkSession, paths: list[str] | str, split_bytes: int | None = None
) -> DataFrame:
    """Parse OSM XML file(s) into the unified element frame.

    Default: one streaming task per file (regional extracts ship as many
    files). split_bytes=N additionally fans each file over
    ceil(size/N) byte-range tasks so ONE planet-scale .osm file still
    parallelizes — pass ~64-256 MB. Sizes are taken driver-side
    (os.path.getsize); on an object store, list sizes there instead.
    Filter with osm_nodes / osm_ways / osm_relations (plan-time
    projections, no re-parse)."""
    import os

    if isinstance(paths, str):
        paths = [paths]
    if split_bytes:
        tasks = []
        for i, p in enumerate(paths):
            size = os.path.getsize(p)
            for s in range(0, max(size, 1), split_bytes):
                tasks.append((p, i, s, min(s + split_bytes, size)))
    else:
        tasks = [(p, i, 0, -1) for i, p in enumerate(paths)]
    files = spark.createDataFrame(
        tasks, "path string, file_idx int, start long, end long"
    ).repartition(max(len(tasks), 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in OSM_ELEMENT_SCHEMA]
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if row.end < 0:
                    rows = list(_parse_one(row.path, int(row.file_idx)))
                else:
                    rows = list(
                        _parse_range(row.path, int(row.file_idx), int(row.start), int(row.end))
                    )
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


OSM_CHANGE_SCHEMA = (
    "action string, elem_type string, osm_id string, lat double, lon double,"
    " version string, changeset string, tags map<string,string>,"
    " nds array<string>, members array<struct<ref:string,mtype:string,role:string>>"
)


def read_osm_change(spark: SparkSession, xml_text: str) -> DataFrame:
    """S10 parse side: an osmChange document (the changeset-download
    response) into an action-stamped element frame. The reference's
    ChangesetDownloadParser.java:44-66 keeps only node id/version and
    bakes the INVERSION into which set each element lands in; here the
    full element content is kept and inversion is the separate
    `sinks.invert_changeset` operator, so the same frame serves revert,
    audit, and diff uses. Driver-side parse by design: changeset
    downloads are bounded by the API's per-changeset element cap (the
    reference holds them in three in-memory HashSets), the same bounded
    contract as the K3/K4 in-memory sinks."""
    import io

    rows: list[tuple] = []
    action: str | None = None
    for event, elem in ET.iterparse(io.StringIO(xml_text), events=("start", "end")):
        if event == "start":
            if elem.tag in ("create", "modify", "delete"):
                action = elem.tag
            continue
        if elem.tag in ("create", "modify", "delete"):
            action = None
        elif elem.tag in ("node", "way", "relation") and action is not None:
            tags = {t.get("k"): t.get("v") for t in elem.findall("tag")}
            nds = [nd.get("ref") for nd in elem.findall("nd")]
            members = [
                (m.get("ref"), m.get("type"), m.get("role"))
                for m in elem.findall("member")
            ]
            rows.append(
                (
                    action,
                    elem.tag,
                    elem.get("id"),
                    float(elem.get("lat")) if elem.get("lat") is not None else None,
                    float(elem.get("lon")) if elem.get("lon") is not None else None,
                    elem.get("version"),
                    elem.get("changeset"),
                    tags or None,
                    nds or None,
                    members or None,
                )
            )
            elem.clear()
    return spark.createDataFrame(rows, OSM_CHANGE_SCHEMA)
