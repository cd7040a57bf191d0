"""GTFS-stop x OSM-node compare pipeline on real OSM data (the
reference's core task re-expressed as DataFrame joins).

Reference semantics (task/CompareData.java:1000-1290):

- operator gate: an OSM node participates only if its network tag is
  absent, 'missing', or matches the agency (OperatorInfo.java:112-126
  bidirectional case-insensitive containment) — CompareData.java:1040-1054.
- id match: node gtfs_id (zero-padded, OsmFormatter.java:36-42) equals a
  stop's id AND Vincenty distance < 400 m (CompareData.java:1068-1075).
  The node iteration is sequential file order and a matched stop enters
  noUpload, so when several nodes carry the same gtfs_id the FIRST in
  document order wins -> we rank candidates by (file_idx, elem_idx).
- category: distance <= 0.5 m (ERROR_TO_ZERO) and tag diff empty ->
  NOTHING_NEW; otherwise MODIFY (both the moved-location and
  different-tags branches, CompareData.java:1076-1148).
- tag diff (compareOsmTags, CompareData.java:443-467): for each gtfs tag
  k=v the OSM side must have k with a case-insensitively equal value, or
  a value containing v as a substring; anything else is a diff.
- conflicts: a stop with NO id match that has some eligible node within
  (0.5 m, 400 m) whose gtfs_id is not any GTFS id (null / 'missing' /
  foreign) is UPLOAD_CONFLICT with a FIXME tag
  (CompareData.java:1152-1222); everything else is UPLOAD_NO_CONFLICT
  (CompareData.java:1262-1283).
- same-location adoption (CompareData.java:1224-1262): a stop with NO id
  match but a gated-in node within ERROR_TO_ZERO whose public_transport
  equals the stop's expected OSM type is treated as the SAME stop: the
  node is adopted (MODIFY + noUpload, gtfs_id assigned), never uploaded
  as a duplicate. The reference's parallelStream makes the id-match vs
  adoption race order-dependent when both exist for one stop; here the
  id match deterministically wins and adoption applies only to stops
  with no id match anywhere, and only from FOREIGN nodes (id absent /
  'missing' / unknown to the feed) — a node carrying ANOTHER stop's
  valid id adopting depends on the reference's scan order (its inner
  loop breaks at whichever stop comes first); we pin the id-match-wins
  resolution, which also keeps the probe's streaming side foreign-only.
- node-side redundancy modifies (CompareData.java:1172-1210): each
  id-LESS node (gtfs_id tag absent or 'missing', no FIXME tag) that sits
  within (0.5 m, 400 m) of an unmatched stop itself enters the modify
  set with FIXME/note (+ network/gtfs_id 'missing' fills) — exposed as
  `redundant_node_modifies` so the osmChange sink can include them.
- merged tags: MODIFY keys take OSM values as default (addToReport,
  CompareData.java:290-299: addAndOverwriteTags(osm) + gtfs_id restored);
  NOTHING_NEW keeps gtfs values and only ADDS osm-only keys
  (OsmPrimitive.addTags, non-overwriting).

Plan shape: the id match is a hash equi-join on the padded id (cheap,
exact); the conflict probe is the cell-prejoin radius join (ring-exploded
SMALL gtfs side, hash join on hex_cell, haversine prefilter in codegen,
exact Vincenty only on survivors). No O(N*M) scan anywhere — the
reference's nested parallelStream loop (CompareData.java:1016-1069)
becomes two hash joins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.geo import EARTH_RADIUS_M, haversine_m_col, vincenty_m_udf
from ..functions.mappings import zero_pad_id
from ..operators.spatial_join import HEX_RES
from ..functions.cells import cover_cell_col, cover_cells_col

RANGE_M = 400.0  # CompareData.java:129
ERROR_TO_ZERO_M = 0.5  # CompareData.java:127
FIXME_REDUNDANT = "This bus stop could be redundant"  # CompareData.java:1155

# r7: Vincenty(WGS-84) vs haversine(R = 6371008.8 mean) bounds for SHORT
# distances — the local ellipsoid metric ds^2 = M^2 dphi^2 + N^2 cos^2
# phi dlambda^2 has curvature radii M in [6335439, 6399594] and N in
# [6378137, 6399594], so vincenty/haversine lies in [6335439/R,
# 6399594/R]. Second-order corrections are O((d/R)^2) ~ 4e-9 at 400 m,
# far inside the margins these constants carry. They let a band test on
# the cheap haversine CLASSIFY most pairs exactly (certainly-in /
# certainly-out of a Vincenty threshold), reserving the Python Vincenty
# kernel for the thin ambiguity shells around each threshold.
_VIN_OVER_HAV_MIN = 0.99442
_VIN_OVER_HAV_MAX = 1.00449


def operator_gate(op_col, agency_names: list[str], alias_regexes: list[str] | None = None):
    """OperatorInfo.isTheSameOperator as a Column predicate
    (OperatorInfo.java:112-126): NULL or 'missing' passes; otherwise
    BIDIRECTIONAL case-insensitive containment against any configured
    agency name/abbreviation/alias, OR a full match of any configured
    alias regex (possibleOperatorRegexPattern, OperatorInfo.java:104-125
    — Pattern.CASE_INSENSITIVE + Matcher.matches, hence the (?i)^(?:…)$
    anchoring)."""
    up = F.upper(op_col)
    cond = op_col.isNull() | (op_col == "missing")
    for name in agency_names:
        n = F.lit(name.upper())
        cond = cond | up.contains(n) | n.contains(up)
    for rx in alias_regexes or []:
        cond = cond | op_col.rlike(f"(?i)^(?:{rx})$")
    return cond


def gtfs_tag_map(gtfs: DataFrame, network_key: str = "operator") -> DataFrame:
    """The reference gtfs Stop's tag table (Stop.java:40-84 constructor +
    GTFSReadIn.java:148-213 gtfs_<col> extras): gtfs_id, <network_key>,
    name, plus every gtfs_* column. Emitted as a map column `g_tags`
    built at plan time from the frame's schema."""
    pairs = [F.lit("gtfs_id"), F.col("gtfs_id"), F.lit(network_key), F.col("operator"),
             F.lit("name"), F.coalesce(F.col("name_raw"), F.lit("none"))]
    for c in gtfs.columns:
        if c.startswith("gtfs_") and c != "gtfs_id":
            pairs += [F.lit(c), F.col(c)]
    m = F.map_filter(F.create_map(*pairs), lambda k, v: v.isNotNull() & (v != ""))
    return gtfs.withColumn("g_tags", m)


def _diff_empty(osm_tags, g_tags):
    """compareOsmTags(osm, gtfs).isEmpty() as a Column: every gtfs tag key
    must exist on the OSM side with an equal (case-insensitive) value or
    a value containing it (CompareData.java:443-467)."""
    return F.forall(
        F.map_entries(g_tags),
        lambda e: F.element_at(osm_tags, e["key"]).isNotNull()
        & (
            (F.upper(F.element_at(osm_tags, e["key"])) == F.upper(e["value"]))
            | F.element_at(osm_tags, e["key"]).contains(e["value"])
        ),
    )


def _gated_nodes(
    nodes: DataFrame,
    agency_names: list[str],
    id_digits: int,
    network_key: str,
    alias_regexes: list[str] | None = None,
) -> DataFrame:
    """Operator-gated node layer with the padded gtfs_id folded into the
    tag map (CompareData.java:1028-1054) plus the raw id/operator values
    the node-side modify branch needs (null vs 'missing' distinction,
    CompareData.java:1177-1205)."""
    padded_gid = F.when(
        F.col("tags").getItem("gtfs_id").isNotNull()
        & (F.col("tags").getItem("gtfs_id") != "missing"),
        zero_pad_id(F.col("tags").getItem("gtfs_id"), id_digits),
    )
    # the reference pads gtfs_id IN PLACE inside the node's tag map before
    # any tag comparison (osmtag.put, CompareData.java:1031-1036) — an
    # unpadded node id must not register as a tag diff
    tags_padded = F.map_filter(
        F.map_zip_with(
            F.col("tags"),
            F.create_map(F.lit("gtfs_id"), padded_gid),
            lambda k, v, p: F.coalesce(p, v),
        ),
        lambda k, v: v.isNotNull(),
    )
    return nodes.filter(
        operator_gate(F.col("tags").getItem(network_key), agency_names, alias_regexes)
    ).select(
        F.col("osm_id"),
        F.col("version").cast("int").cast("string").alias("osm_version"),
        F.col("user").alias("osm_user"),
        F.col("timestamp").alias("osm_timestamp"),
        F.col("lat").alias("o_lat"),
        F.col("lon").alias("o_lon"),
        tags_padded.alias("osm_tags"),
        padded_gid.alias("osm_gtfs_id"),
        F.col("tags").getItem("gtfs_id").alias("o_gid_raw"),
        F.col("tags").getItem(network_key).alias("o_operator_raw"),
        F.col("tags").getItem("FIXME").isNotNull().alias("o_has_fixme"),
        (F.col("file_idx").cast("long") * F.lit(1 << 40) + F.col("elem_idx")).alias(
            "doc_order"
        ),
    )


def _probe_pairs(
    g: DataFrame,
    n: DataFrame,
    unmatched: DataFrame,
    radius_m: float,
    b,
    known_ids: DataFrame | None = None,
    max_pre_m: float | None = None,
):
    """Cell-prejoin radius join between the UNMATCHED stops and the
    FOREIGN nodes (gtfs_id absent / 'missing' / known to NO stop in the
    feed — the UPLOAD_CONFLICT gate, CompareData.java:1216-1222, and the
    only nodes that can source a node-side modify): ring-exploded stop
    side (bounded — a transit feed), streaming node side, haversine
    codegen prefilter, exact Vincenty on survivors. Returns pairs with
    dist_m < radius_m.

    The anti-join prefilter matters at scale: in a synced region most
    nodes carry valid ids, so probing ALL gated nodes quadruples the
    streaming side (measured: compare phase 134.9 s -> 196.3 s at 4M
    stops/2 cores) to serve only the order-ambiguous adopt-across-ids
    corner — see compare_stops' adoption note.

    known_ids: the id UNIVERSE that defines foreign-ness. Defaults to the
    stop frame g; pass the FULL feed's ids when g is a subset (the
    incremental-sync delta path re-compares only affected stops, but a
    node carrying some other stop's valid id is still not foreign).

    r7 (guide §2.3/§8 "decide with small rows"): the stop side entering
    the candidate join is SLIMMED to (gtfs_id, lat, lon[,
    public_transport]) — the full stop row (g_tags map, raw strings)
    used to ride the ring-cell explosion into the hash-join BUILD side,
    which at 2M stops was a multi-GB build that thrashed execution
    memory (observed: 'Can't acquire 536870912 bytes to build hash
    relation' and a 48-146 s wall spread). Downstream branches that need
    the full stop row (the adoption branch) re-attach it by gtfs_id to
    the tiny <= 0.5 m subset. A conservative bbox prefilter (no trig)
    also now runs before the haversine prefilter, which runs before the
    exact Vincenty — three stages, each feeding the next only its
    survivors; the kept pair set is unchanged (every bound is
    conservative for the stage after it)."""
    gids = (known_ids if known_ids is not None else g).select(
        F.col("gtfs_id").alias("osm_gtfs_id")
    ).distinct()
    fn = n.join(b(gids), "osm_gtfs_id", "left_anti")
    # r7: candidate cells come from the JVM covering grid
    # (functions.cells.cover_cells_col) instead of the hex k-ring pandas
    # UDF — same covering contract, but 9-15 cells per stop instead of
    # 37-91 at res 9, zero Python in the prejoin, and the whole stage
    # codegens (guide §4.1 "prefer built-ins"). The grid is sized for
    # the haversine-prefilter keep set (radius * 1.01), which contains
    # every Vincenty-true pair.
    r_cover = radius_m * 1.01
    slim_cols = ["gtfs_id", "lat", "lon"] + (
        ["public_transport"] if "public_transport" in unmatched.columns else []
    )
    u = (
        unmatched.select(*slim_cols)
        .withColumn(
            "_pcell", F.explode(cover_cells_col(F.col("lat"), F.col("lon"), r_cover))
        )
        .withColumn("_s_coslat", F.cos(F.radians(F.col("lat"))))
    )
    fn = fn.withColumn(
        "_pcell", cover_cell_col(F.col("o_lat"), F.col("o_lon"), r_cover)
    ).withColumn("_n_coslat", F.cos(F.radians(F.col("o_lat"))))
    # bbox bounds conservative for {haversine < radius_m * 1.01} (the
    # stage-2 keep set): d >= R|dlat|, and the lon test only applies
    # under the |dlon| < 1 deg guard where sin(x) >= 0.9999874*x holds.
    r_eff = radius_m * 1.01
    dlat_bound = math.degrees(r_eff / EARTH_RADIUS_M) * 1.0000001
    dlon_bound2 = (math.degrees((r_eff / EARTH_RADIUS_M) / 0.9999874) * 1.0000001) ** 2
    dlat = F.col("o_lat") - F.col("lat")
    dlon = F.col("o_lon") - F.col("lon")
    cosprod = F.col("_s_coslat") * F.col("_n_coslat")
    bbox = (F.abs(dlat) < F.lit(dlat_bound)) & (
        (dlon * dlon * cosprod < F.lit(dlon_bound2)) | (F.abs(dlon) >= F.lit(1.0))
    )
    # broadcast the STOP side: unmatched stops x ring cells is bounded
    # (a transit feed), the foreign-node layer is not — it streams through
    # the hash join like the id-match scan
    out = (
        fn.join(b(u), "_pcell")
        .filter(bbox)
        .withColumn(
            "_pre", haversine_m_col(F.col("lat"), F.col("lon"), F.col("o_lat"), F.col("o_lon"))
        )
        .filter(F.col("_pre") < radius_m * 1.01)
    )
    # optional caller-supplied haversine band cap (r7): a consumer that
    # only needs pairs below some Vincenty threshold T passes
    # max_pre_m = T / 0.99442 so the Python kernel sees just that band
    if max_pre_m is not None:
        out = out.filter(F.col("_pre") <= max_pre_m)
    return (
        out.withColumn(
            "dist_m", vincenty_m_udf(F.col("o_lat"), F.col("o_lon"), F.col("lat"), F.col("lon"))
        )
        .filter(F.col("dist_m") < radius_m)
        .drop("_pre", "_pcell", "_s_coslat", "_n_coslat")
    )


def _conflict_stop_ids(
    g: DataFrame,
    n: DataFrame,
    unmatched: DataFrame,
    radius_m: float,
    b,
    known_ids: DataFrame | None = None,
) -> DataFrame:
    """Distinct gtfs_ids of unmatched stops with at least one FOREIGN
    node at Vincenty distance in (ERROR_TO_ZERO_M, radius_m) — the
    UPLOAD_CONFLICT evidence — computed as EXISTENCE, not as a pair
    materialization (r7, guide §1.2 step 1).

    Why: the conflict branch only ever consumed
    `pairs.select(gtfs_id).distinct()`, yet the dense-city worst case
    yields ~10^9 candidate pairs and ~10^8 true ones, all of which
    previously crossed the Python Vincenty kernel. Here:

    1. a LEFT SEMI cell join with the whole predicate in the join
       condition — bbox, then haversine inside the CERTAIN band
       (hav in (ERROR_TO_ZERO/0.99442, radius/1.00449), where the
       curvature bounds guarantee the Vincenty classification) — marks
       a stop as conflicted at its FIRST qualifying node, without
       emitting pairs or calling Python;
    2. only stops with NO certain pair (geometrically: all their
       candidates within ~6 mm of the 0.5 m threshold or ~6 m of the
       400 m threshold) fall through to an exact Vincenty refinement
       over their shell pairs. Any pair with vin in (0.5, 400) has
       hav in (0.5/1.00449, 400/0.99442), which the certain band plus
       the two shells cover completely, so the returned id set is
       identical to the pair-based one.

    The node side ships only coordinates (existence needs nothing
    else); both joins hash the node side by cell so the per-row probe
    is bucket-local."""
    gids = (known_ids if known_ids is not None else g).select(
        F.col("gtfs_id").alias("osm_gtfs_id")
    ).distinct()
    r_cover = radius_m * 1.01
    fn = (
        n.join(b(gids), "osm_gtfs_id", "left_anti")
        .select("o_lat", "o_lon")
        .withColumn("_pcell_n", cover_cell_col(F.col("o_lat"), F.col("o_lon"), r_cover))
        .withColumn("_n_coslat", F.cos(F.radians(F.col("o_lat"))))
        .hint("shuffle_hash")
    )
    u = (
        unmatched.select("gtfs_id", "lat", "lon")
        .withColumn(
            "_pcell", F.explode(cover_cells_col(F.col("lat"), F.col("lon"), r_cover))
        )
        .withColumn("_s_coslat", F.cos(F.radians(F.col("lat"))))
    )
    dlat = F.col("o_lat") - F.col("lat")
    dlon = F.col("o_lon") - F.col("lon")
    cosprod = F.col("_s_coslat") * F.col("_n_coslat")
    dlat_bound = math.degrees(r_cover / EARTH_RADIUS_M) * 1.0000001
    dlon_bound2 = (math.degrees((r_cover / EARTH_RADIUS_M) / 0.9999874) * 1.0000001) ** 2
    bbox = (F.abs(dlat) < F.lit(dlat_bound)) & (
        (dlon * dlon * cosprod < F.lit(dlon_bound2)) | (F.abs(dlon) >= F.lit(1.0))
    )
    pre = haversine_m_col(F.col("lat"), F.col("lon"), F.col("o_lat"), F.col("o_lon"))
    cell_eq = F.col("_pcell") == F.col("_pcell_n")
    lo_sure = ERROR_TO_ZERO_M / _VIN_OVER_HAV_MIN  # hav above => vin > ERROR_TO_ZERO
    hi_sure = radius_m / _VIN_OVER_HAV_MAX  # hav below => vin < radius
    lo_shell = ERROR_TO_ZERO_M / _VIN_OVER_HAV_MAX  # hav below => vin <= ERROR_TO_ZERO
    hi_shell = radius_m / _VIN_OVER_HAV_MIN  # hav above => vin >= radius

    sure = (
        u.join(
            fn,
            cell_eq & bbox & (pre > F.lit(lo_sure)) & (pre < F.lit(hi_sure)),
            "left_semi",
        )
        .select("gtfs_id")
        .distinct()
    )
    amb = u.join(b(sure), "gtfs_id", "left_anti")
    shell_refined = (
        amb.join(
            fn,
            cell_eq
            & bbox
            & (pre >= F.lit(lo_shell))
            & (pre <= F.lit(hi_shell))
            & ((pre <= F.lit(lo_sure)) | (pre >= F.lit(hi_sure))),
            "inner",
        )
        .withColumn(
            "dist_m",
            vincenty_m_udf(F.col("o_lat"), F.col("o_lon"), F.col("lat"), F.col("lon")),
        )
        .filter((F.col("dist_m") > ERROR_TO_ZERO_M) & (F.col("dist_m") < radius_m))
        .select("gtfs_id")
        .distinct()
    )
    return sure.unionByName(shell_refined).distinct()


def compare_stops(
    gtfs: DataFrame,
    nodes: DataFrame,
    agency_names: list[str],
    id_digits: int = 4,
    radius_m: float = RANGE_M,
    network_key: str = "operator",
    broadcast_stops: bool = True,
    alias_regexes: list[str] | None = None,
    known_ids: DataFrame | None = None,
) -> DataFrame:
    """Categorize every GTFS stop against the OSM node layer.

    known_ids: optional full-feed stop frame (or any frame with a
    gtfs_id column) defining the foreign-node id universe when `gtfs` is
    a SUBSET of the feed (incremental-sync delta re-compare); defaults
    to `gtfs` itself.

    broadcast_stops: a transit FEED (10^3-10^6 stops) broadcasts — every
    join becomes a map-side hash join over the streaming node scan. For a
    continental stop/feature layer that outgrows broadcast, pass False:
    the same equi-joins shuffle-hash-partition on their keys (gtfs_id /
    hex_cell) and scale with cores instead of paying a serial broadcast
    build (measured: 1M-stop world 0.60 -> >=0.8 efficiency at 2->8
    cores; tools/bench_compare.py).

    Returns one row per stop: (gtfs_id, category, osm_id, osm_version,
    osm_user, osm_timestamp, dist_m, osm_tags, merged_tags, lat, lon,
    final_lat, final_lon) — merged_tags per the reference's
    finalStops default-value rules.
    """
    g = gtfs_tag_map(gtfs, network_key)
    # shuffle path: HINT every build side to shuffled-hash — Catalyst's
    # static size estimates under filter/explode chains otherwise pick
    # BroadcastHashJoin and try to broadcast a multi-GiB side at 10^6+
    # stops (observed: 10 GiB broadcast attempt at 4M stops)
    b = F.broadcast if broadcast_stops else (lambda df: df.hint("shuffle_hash"))
    n = _gated_nodes(nodes, agency_names, id_digits, network_key, alias_regexes)

    # ---- id matches: hash equi-join on the padded id, exact Vincenty gate
    # the stop side is the SMALL side at any scale (a transit feed is
    # 10^3-10^6 stops; the node layer is unbounded): broadcast it so the
    # id match is a map-side hash join over the node scan, never an SMJ
    # r7: haversine prefilter before the Vincenty Python boundary (guide
    # §4 — fewer rows cross it). Vincenty(WGS-84) and haversine(R mean)
    # agree within the min/max local curvature ratio [0.9944, 1.0045], so
    # vincenty < radius implies haversine < radius*1.006 — the 1.01
    # tolerance (the same one _probe_pairs has always used) can never
    # drop a true match; far pairs (e.g. a stale id 2.5 km away) skip
    # the Python round-trip entirely.
    idm = (
        b(g).join(n, g["gtfs_id"] == n["osm_gtfs_id"])
        .withColumn(
            "_hpre",
            haversine_m_col(F.col("lat"), F.col("lon"), F.col("o_lat"), F.col("o_lon")),
        )
        .filter(F.col("_hpre") < radius_m * 1.01)
        .drop("_hpre")
        .withColumn(
            "dist_m", vincenty_m_udf(F.col("o_lat"), F.col("o_lon"), F.col("lat"), F.col("lon"))
        )
        .filter(F.col("dist_m") < radius_m)
    )
    first_wins = W.partitionBy("gtfs_id").orderBy("doc_order")
    best = (
        idm.withColumn("_rn", F.row_number().over(first_wins))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    best = best.withColumn(
        "category",
        F.when(
            (F.col("dist_m") <= ERROR_TO_ZERO_M)
            & _diff_empty(F.col("osm_tags"), F.col("g_tags")),
            F.lit("NOTHING_NEW"),
        ).otherwise(F.lit("MODIFY")),
    )

    # r7: the matched-id set is a NARROW persisted frame (distinct ids of
    # the Vincenty-confirmed join — identical to best's id set, since the
    # first-wins window only picks among rows of one id). Every unmatched/
    # rest/probe consumer previously re-ran the id-match join + Vincenty
    # UDF subtree (Spark reuses exchanges, not operator subtrees between
    # them); now the full idm tree runs once for the output branch and the
    # other branches anti-join against ~bytes-per-stop of persisted ids.
    # The persist is an intra-invocation intermediate (recomputed on every
    # call; the ContextCleaner reclaims it when the frame is dropped).
    matched_ids = idm.select("gtfs_id").distinct().persist()
    unmatched = g.join(b(matched_ids), "gtfs_id", "left_anti")

    # ---- radius probe over the unmatched stops (r7): the conflict
    # branch is now existence-only (_conflict_stop_ids — no pair
    # materialization, Python Vincenty only on ambiguity shells), so the
    # exact pair probe survives ONLY for the adoption branch, band-capped
    # to the <= 0.5 m Vincenty neighborhood it consumes.
    has_pt = "public_transport" in gtfs.columns
    if has_pt:
        pairs = _probe_pairs(
            g, n, unmatched, radius_m, b, known_ids,
            max_pre_m=ERROR_TO_ZERO_M / _VIN_OVER_HAV_MIN,
        )

    # same-location adoption (CompareData.java:1224-1262): node within
    # ERROR_TO_ZERO whose public_transport equals the stop's expected OSM
    # type -> the stop adopts the node (MODIFY, enters noUpload). The
    # reference NPEs on a pt-less node here; we require both sides
    # non-null. First node in document order wins (parallelStream racy in
    # the reference; pinned deterministic here). PLAN SPECIALIZATION: a
    # feed with no public_transport column cannot adopt (the equality is
    # NULL for every row), so the whole branch — its window, union, and
    # second probe consumer — is dropped at build time; the conflict
    # probe then reads the pairs subtree exactly once (measured: 69.9 ->
    # 59.5 s best-of-3 on the 4M-stop compare phase at 8 cores).
    if has_pt:
        # pairs carry only the slim stop columns (see _probe_pairs r7
        # note); the full stop row is re-attached here, to the tiny
        # <= 0.5 m winner set only, by an equi-join on gtfs_id with the
        # adoption rows as the build/broadcast side.
        adopted_slim = (
            pairs.filter(
                (F.col("dist_m") <= ERROR_TO_ZERO_M)
                & F.col("osm_tags").getItem("public_transport").isNotNull()
                & (
                    F.col("osm_tags").getItem("public_transport")
                    == F.col("public_transport")
                )
            )
            .withColumn("_rn", F.row_number().over(first_wins))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "lat", "lon", "public_transport")
        )
        adopted = unmatched.join(b(adopted_slim), "gtfs_id").withColumn(
            "category", F.lit("MODIFY")
        )
        best = best.unionByName(adopted.select(*best.columns))

    # merged tags: MODIFY -> osm values win, gtfs_id restored; NOTHING_NEW
    # -> gtfs values win, osm-only keys added. map_zip_with merges by key.
    osm_wins = F.map_zip_with(
        F.col("g_tags"), F.col("osm_tags"), lambda k, gv, ov: F.coalesce(ov, gv)
    )
    gtfs_wins = F.map_zip_with(
        F.col("g_tags"), F.col("osm_tags"), lambda k, gv, ov: F.coalesce(gv, ov)
    )
    best = best.withColumn(
        "merged_tags",
        F.when(
            F.col("category") == "MODIFY",
            F.map_zip_with(
                osm_wins,
                F.create_map(F.lit("gtfs_id"), F.col("gtfs_id")),
                lambda k, mv, idv: F.coalesce(idv, mv),
            ),
        ).otherwise(gtfs_wins),
    ).withColumn(
        "final_lat", F.when(F.col("category") == "MODIFY", F.col("o_lat")).otherwise(F.col("lat"))
    ).withColumn(
        "final_lon", F.when(F.col("category") == "MODIFY", F.col("o_lon")).otherwise(F.col("lon"))
    )

    # ---- conflict branch: adopted stops entered noUpload, so only the
    # REST of the unmatched stops can conflict (CompareData.java:1060).
    if has_pt:
        rest = unmatched.join(
            b(adopted_slim.select("gtfs_id")), "gtfs_id", "left_anti"
        )
    else:
        rest = unmatched
    # r7: ONE left outer join against the flagged conflict-id set replaces
    # the previous semi+anti pair — the rest frame is scanned/shuffled
    # once instead of twice and the union has one branch fewer (guide
    # §2.4). The id set itself comes from the existence-only fast path
    # (_conflict_stop_ids; distinct, so the outer join cannot duplicate
    # rows); the per-row when() reproduces both branches' columns exactly.
    conflict_flag = b(
        _conflict_stop_ids(g, n, unmatched, radius_m, b, known_ids)
        .withColumn("_cfl", F.lit(1))
    )
    is_cfl = F.col("_cfl").isNotNull()
    fixme_tags = F.map_zip_with(
        F.col("g_tags"),
        F.create_map(F.lit("FIXME"), F.lit(FIXME_REDUNDANT)),
        lambda k, gv, fv: F.coalesce(gv, fv),
    )
    rest_out = (
        rest.join(conflict_flag, "gtfs_id", "left")
        .withColumn(
            "category",
            F.when(is_cfl, F.lit("UPLOAD_CONFLICT")).otherwise(
                F.lit("UPLOAD_NO_CONFLICT")
            ),
        )
        .withColumn(
            "merged_tags", F.when(is_cfl, fixme_tags).otherwise(F.col("g_tags"))
        )
        .drop("_cfl")
    )

    null_osm = [
        F.lit(None).cast("string").alias(c)
        for c in ("osm_id", "osm_version", "osm_user", "osm_timestamp")
    ]
    out_cols = [
        "gtfs_id", "category", "osm_id", "osm_version", "osm_user", "osm_timestamp",
        "dist_m", "osm_tags", "merged_tags", "lat", "lon", "final_lat", "final_lon",
        "lat_raw", "lon_raw", "name_raw", "g_tags",
    ]
    unmatched_shape = (
        lambda df: df.select(
            "gtfs_id", "category", *null_osm,
            F.lit(None).cast("double").alias("dist_m"),
            F.lit(None).cast("map<string,string>").alias("osm_tags"),
            "merged_tags", "lat", "lon",
            F.col("lat").alias("final_lat"), F.col("lon").alias("final_lon"),
            "lat_raw", "lon_raw", "name_raw", "g_tags",
        )
    )
    return best.select(*out_cols).unionByName(unmatched_shape(rest_out))


NOTE_ADD_ID_OP = "Please add gtfs_id and operator after removing FIXME"  # CompareData.java:1184
NOTE_ADD_ID = "Please add gtfs_id after removing FIXME"  # CompareData.java:1189


def redundant_node_modifies(
    gtfs: DataFrame,
    nodes: DataFrame,
    agency_names: list[str],
    id_digits: int = 4,
    radius_m: float = RANGE_M,
    network_key: str = "operator",
    broadcast_stops: bool = True,
    alias_regexes: list[str] | None = None,
    known_ids: DataFrame | None = None,
) -> DataFrame:
    """Node-side redundancy modifies (CompareData.java:1172-1210): every
    gated-in node with NO usable gtfs_id (tag absent or 'missing') and no
    pre-existing FIXME that lies within (ERROR_TO_ZERO, radius) of some
    unmatched stop gains FIXME + note tags (addTag = put-if-absent,
    OsmPrimitive.java:44-52) plus 'missing' fills for absent
    network/gtfs_id keys, and enters the modify set feeding the osmChange
    sink — the reference's companion output to compare_stops'
    UPLOAD_CONFLICT rows. Returns one row per node (osm_id, version, lat,
    lon, user, timestamp, tags), sink-ready for osm_change_xml(modify=).

    Nodes consumed by the same-location adoption branch are excluded:
    the reference's `!modify.contains(es)` guard (CompareData.java:1179)
    skips nodes already queued for modification. Stops consumed by
    adoption are excluded too — under the reference's sequential
    reading an adopted stop enters noUpload (CompareData.java:1230)
    and later nodes skip it (:1060), so it cannot source a FIXME;
    this mirrors compare_stops' `rest` exclusion (pinned in
    test_redundant_modifies_skip_adopted_stop).
    """
    g = gtfs_tag_map(gtfs, network_key)
    # shuffle path: HINT every build side to shuffled-hash — Catalyst's
    # static size estimates under filter/explode chains otherwise pick
    # BroadcastHashJoin and try to broadcast a multi-GiB side at 10^6+
    # stops (observed: 10 GiB broadcast attempt at 4M stops)
    b = F.broadcast if broadcast_stops else (lambda df: df.hint("shuffle_hash"))
    n = _gated_nodes(nodes, agency_names, id_digits, network_key, alias_regexes)

    matched_ids = (
        b(g.select("gtfs_id", "lat", "lon"))
        .join(n.select("osm_gtfs_id", "o_lat", "o_lon"), g["gtfs_id"] == n["osm_gtfs_id"])
        # r7: same haversine-before-Vincenty prefilter as compare_stops'
        # id-match branch (1.01 tolerance covers the curvature spread)
        .withColumn(
            "_hpre",
            haversine_m_col(F.col("lat"), F.col("lon"), F.col("o_lat"), F.col("o_lon")),
        )
        .filter(F.col("_hpre") < radius_m * 1.01)
        .drop("_hpre")
        .withColumn(
            "dist_m", vincenty_m_udf(F.col("o_lat"), F.col("o_lon"), F.col("lat"), F.col("lon"))
        )
        .filter(F.col("dist_m") < radius_m)
        .select("gtfs_id")
        .distinct()
    )
    unmatched = g.join(b(matched_ids), "gtfs_id", "left_anti")
    pairs = _probe_pairs(g, n, unmatched, radius_m, b, known_ids)

    stop_pt = (
        F.col("public_transport")
        if "public_transport" in gtfs.columns
        else F.lit(None).cast("string")
    )
    cand = pairs.filter(
        (F.col("dist_m") > ERROR_TO_ZERO_M)
        & F.col("osm_gtfs_id").isNull()
        & ~F.col("o_has_fixme")
    )
    if "public_transport" in gtfs.columns:
        # nodes consumed by the adoption branch are excluded (the
        # reference's !modify.contains guard), and so are the adopted
        # STOPS themselves: an adopted stop enters noUpload
        # (CompareData.java:1230) before later nodes scan it, so an
        # id-less node whose only nearby unmatched stop was adopted must
        # NOT gain a FIXME — this pins the same sequential reading as
        # compare_stops' `rest` exclusion. Impossible without a
        # public_transport column, so both subtrees drop at build time.
        adoptable = pairs.filter(
            (F.col("dist_m") <= ERROR_TO_ZERO_M)
            & F.col("osm_tags").getItem("public_transport").isNotNull()
            & (F.col("osm_tags").getItem("public_transport") == stop_pt)
        )
        cand = cand.join(
            b(adoptable.select("osm_id").distinct()), "osm_id", "left_anti"
        ).join(b(adoptable.select("gtfs_id").distinct()), "gtfs_id", "left_anti")
    # one modify per node no matter how many stops flag it
    per_node = (
        cand.withColumn(
            "_rn", F.row_number().over(W.partitionBy("osm_id").orderBy("gtfs_id"))
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    note = F.when(
        F.col("o_operator_raw").isNull() | (F.col("o_operator_raw") == "missing"),
        F.lit(NOTE_ADD_ID_OP),
    ).otherwise(F.lit(NOTE_ADD_ID))
    # addTag is put-if-absent: the node's existing value wins
    with_fixme = F.map_zip_with(
        F.col("osm_tags"),
        F.create_map(F.lit("FIXME"), F.lit(FIXME_REDUNDANT), F.lit("note"), note),
        lambda k, ov, av: F.coalesce(ov, av),
    )
    fills = F.create_map(
        F.lit(network_key),
        F.when(F.col("o_operator_raw").isNull(), F.lit("missing")),
        F.lit("gtfs_id"),
        F.when(F.col("o_gid_raw").isNull(), F.lit("missing")),
    )
    merged = F.map_filter(
        F.map_zip_with(with_fixme, fills, lambda k, mv, fv: F.coalesce(mv, fv)),
        lambda k, v: v.isNotNull(),
    )
    return per_node.select(
        "osm_id",
        F.col("osm_version").alias("version"),
        F.col("o_lat").alias("lat"),
        F.col("o_lon").alias("lon"),
        F.col("osm_user").alias("user"),
        F.col("osm_timestamp").alias("timestamp"),
        merged.alias("tags"),
    )


# export removals: WriteFile.exportStops, io/WriteFile.java:267-272
_EXPORT_DROP = ("name", "source", "highway", "gtfs_id")


def export_gtfs_value_with_osm_tags(
    compared: DataFrame,
    gtfs_fields: list[str],
    network_key: str = "operator",
) -> DataFrame:
    """K1 'GTFS value + OSM tags' export (io/WriteFile.java:214-296 with
    gui/ReportViewer.java:3217-3228 semantics: agency gtfs values for the
    CSV fields, merged tags minus consumed/suppressed keys as a k=v|k=v
    column). Tag order canonicalized (sorted) — the reference emits
    java.util.Hashtable iteration order, which is not a contract.
    """
    consumed = [f"gtfs_{f}" for f in gtfs_fields] + ["url", "transport:zone"]
    drop = set(_EXPORT_DROP) | {network_key} | set(consumed)
    # agency value wins for keys the agency stop carries (addTags is
    # non-overwriting): g_tags keys keep their gtfs value
    agency_wins = F.map_zip_with(
        F.col("g_tags"), F.col("merged_tags"), lambda k, gv, mv: F.coalesce(gv, mv)
    )
    kept = F.map_filter(
        agency_wins,
        lambda k, v: ~k.isin(*sorted(drop)) & (k != "none") & (k != ""),
    )
    osm_tags_str = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(kept)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        "|",
    )
    cols = [F.col("gtfs_id").alias("stop_id")]
    for f_ in gtfs_fields:
        if f_ == "stop_id":
            continue
        elif f_ == "stop_name":
            cols.append(F.col("name_raw").alias("stop_name"))
        elif f_ == "stop_lat":
            cols.append(F.col("lat_raw").alias("stop_lat"))
        elif f_ == "stop_lon":
            cols.append(F.col("lon_raw").alias("stop_lon"))
        else:
            cols.append(F.element_at(F.col("g_tags"), F.lit(f"gtfs_{f_}")).alias(f_))
    cols.append(osm_tags_str.alias("OSM_TAGs"))
    return compared.select(*cols)


def member_gtfs_ids(
    members: DataFrame, compared: DataFrame, nodes: DataFrame
) -> DataFrame:
    """J8: resolve each relation member's gtfs_id — first from the
    compare output's osm_id -> gtfs_id map (osmIdToGtfsId,
    CompareData.java:774-776), else from the referenced node's own
    gtfs_id tag (CompareData.java:777-785). Two left equi-joins on ref.
    """
    matched = compared.filter(F.col("osm_id").isNotNull()).select(
        F.col("osm_id").alias("ref"), F.col("gtfs_id").alias("_matched_gid")
    )
    node_ids = nodes.select(
        F.col("osm_id").alias("ref"),
        F.col("tags").getItem("gtfs_id").alias("_node_gid"),
    )
    return (
        members.join(matched, "ref", "left")
        .join(node_ids, "ref", "left")
        .withColumn("member_gtfs_id", F.coalesce("_matched_gid", "_node_gid"))
        .drop("_matched_gid", "_node_gid")
    )


def relation_change_status(
    pairs: DataFrame,
    route_members: DataFrame,
    relation_members: DataFrame,
    route_col: str = "route_id",
    rel_col: str = "relation_id",
    ref_col: str = "ref",
) -> DataFrame:
    """Relation change detection (CompareData.java:822-828): a matched
    (gtfs route, osm relation) pair is modified ('m') when the OSM
    relation does NOT contain every member of the gtfs route
    (!em.containsAll(r.getOsmMembers())), else unchanged ('e'). The tag
    side of that check is compareOsmTags (q18's operator) composed by the
    caller.

    pairs: (route_col, rel_col); route_members: (route_col, ref_col);
    relation_members: (rel_col, ref_col). Plan: join route members
    through the pairing, LEFT ANTI against the relation's member set
    (hash join on (rel, ref)), any survivor marks the pair modified.
    Scales: every join is a key equi-join, partial-agg distinct.
    """
    g = pairs.join(route_members, route_col)
    missing = (
        g.join(relation_members, [rel_col, ref_col], "left_anti")
        .select(route_col, rel_col)
        .distinct()
        .withColumn("status", F.lit("m"))
    )
    return pairs.join(missing, [route_col, rel_col], "left").withColumn(
        "status", F.coalesce(F.col("status"), F.lit("e"))
    )


def export_osm_value_with_osm_tags(
    compared: DataFrame,
    gtfs_fields: list[str],
    network_key: str = "operator",
    conflicts_only: bool = False,
) -> DataFrame:
    """K1 'OSM value' exports (gui/ReportViewer.java:3230-3243 +
    io/WriteFile.java:214-296): the CSV name/lat/lon columns carry the
    FINAL default values (MODIFY stops take the matched node's location
    and name; others keep gtfs), tags from merged_tags minus the same
    consumed/suppressed keys. conflicts_only keeps stops whose default
    changed (osmDefaultOnlyChangedFinalStops, ReportViewer.java:419-439:
    MODIFY category)."""
    consumed = [f"gtfs_{f}" for f in gtfs_fields] + ["url", "transport:zone"]
    drop = set(_EXPORT_DROP) | {network_key} | set(consumed)
    src = compared
    if conflicts_only:
        src = src.filter(F.col("category") == "MODIFY")
    kept = F.map_filter(
        F.col("merged_tags"),
        lambda k, v: ~k.isin(*sorted(drop)) & (k != "none") & (k != ""),
    )
    osm_tags_str = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(kept)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        "|",
    )
    cols = [F.col("gtfs_id").alias("stop_id")]
    for f_ in gtfs_fields:
        if f_ == "stop_id":
            continue
        elif f_ == "stop_name":
            cols.append(
                F.coalesce(
                    F.element_at(F.col("merged_tags"), F.lit("name")),
                    F.col("name_raw"),
                ).alias("stop_name")
            )
        elif f_ == "stop_lat":
            cols.append(F.col("final_lat").cast("string").alias("stop_lat"))
        elif f_ == "stop_lon":
            cols.append(F.col("final_lon").cast("string").alias("stop_lon"))
        else:
            cols.append(F.element_at(F.col("g_tags"), F.lit(f"gtfs_{f_}")).alias(f_))
    cols.append(osm_tags_str.alias("OSM_TAGs"))
    return src.select(*cols)
