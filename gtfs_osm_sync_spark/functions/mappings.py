"""GTFS->OSM scalar mappings (SURVEY.md §2.8 F-group) as Column builders.

Each function mirrors one mapping in the reference (citations inline),
expressed as when/otherwise chains so Catalyst constant-folds and
codegens them — no UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zero_pad_id(col: Column, digits: int) -> Column:
    """F2: zero-pad stop ids to the operator digit count
    (tools/OsmFormatter.java:36-42). The reference only PREPENDS zeros;
    plain lpad would truncate ids longer than `digits`, so pad only when
    shorter."""
    s = col.cast("string")
    return F.when(F.length(s) < digits, F.lpad(s, digits, "0")).otherwise(s)


def xml_escape(col: Column) -> Column:
    """F3: XML entity escaping for the OsmChange sink
    (tools/OsmFormatter.java:44-54). & first, then the rest."""
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    out = F.regexp_replace(out, '"', "&quot;")
    out = F.regexp_replace(out, "'", "&apos;")
    return out


def location_type_to_osm(col: Column) -> Column:
    """F8: GTFS location_type code -> public_transport value
    (io/GTFSReadIn.java:177-188): 0/blank -> platform, 1 -> station."""
    return (
        F.when(col.cast("int") == 1, "station")
        .when(col.isNull() | (col.cast("string") == ""), "platform")
        .otherwise("platform")
    )


def wheelchair_to_osm(col: Column) -> Column:
    """F9: wheelchair_boarding code -> OSM wheelchair tag
    (GTFSReadIn.java:189-210): 1 -> limited, 2 -> no, else none."""
    return (
        F.when(col.cast("int") == 1, "limited")
        .when(col.cast("int") == 2, "no")
        .otherwise(F.lit(""))
    )


def route_type_to_mode(col: Column) -> Column:
    """F10: GTFS route_type -> OSM route value (GTFSReadIn.java:325-345):
    0 light_rail, 1 subway, 2 train, 3 bus, 4 ferry, 5 tram,
    6 aerialway=yes, 7 railway=funicular. Cases 6/7 change the *key* too
    — see route_type_to_key.
    """
    c = col.cast("int")
    return (
        F.when(c == 0, "light_rail")
        .when(c == 1, "subway")
        .when(c == 2, "train")
        .when(c == 3, "bus")
        .when(c == 4, "ferry")
        .when(c == 5, "tram")
        .when(c == 6, "yes")
        .when(c == 7, "funicular")
        .otherwise("bus")
    )


def route_type_to_key(col: Column) -> Column:
    """F10 key side: which OSM tag key carries the mode (route= normally;
    aerialway= for 6, railway= for 7; GTFSReadIn.java:339-343)."""
    c = col.cast("int")
    return (
        F.when(c == 6, "aerialway").when(c == 7, "railway").otherwise("route")
    )


def normalize_color(col: Column) -> Column:
    """F11: 3-6 digit hex color gets '#'; FFFFFF (white default) dropped
    (GTFSReadIn.java:303,349-355)."""
    is_hex = col.rlike("^[a-fA-F0-9]{3,6}$")
    return (
        F.when(F.upper(col) == "FFFFFF", F.lit(None).cast("string"))
        .when(is_hex, F.concat(F.lit("#"), col))
        .otherwise(col)
    )


def squeeze_whitespace(col: Column) -> Column:
    """F16: collapse runs of spaces + trim (GTFSReadIn.java:212,366)."""
    return F.trim(F.regexp_replace(col, " +", " "))


def pickup_dropoff_to_role(pickup: Column, dropoff: Column) -> Column:
    """F12: pickup/drop_off codes -> PTv2 member role
    (task/CompareData.java:653-662). The reference tests ==1 / !=1 (not
    1/0 pairs): GTFS codes 2/3 (phone agency / coordinate with driver)
    count as 'available' — pickup==1 with drop_off 0/2/3 is exit-only."""
    p = pickup.cast("int")
    d = dropoff.cast("int")
    return (
        F.when((p == 1) & (d != 1), "platform_exit_only")
        .when((d == 1) & (p != 1), "platform_entry_only")
        .otherwise("platform")
    )


def duration_hhmm(start_s: Column, end_s: Column) -> Column:
    """F15: duration 'HH:MM' from epoch-second columns
    (object/RouteVariant.java:157-180)."""
    dur = (end_s - start_s).cast("long")
    return F.format_string(
        "%02d:%02d", (dur / 3600).cast("int"), ((dur % 3600) / 60).cast("int")
    )


def rewrite_member_role(role: Column, ref_pt: Column) -> Column:
    """F13: rewrite a relation member's role from the REFERENCED element's
    public_transport value (object/RelationMember.java:60-82
    getRoleForFinalOutput). Faithful to the reference's quirk: only roles
    ending in _exit_only / _entry_only are rewritten; a bare role is kept
    even when the referenced type suggests another base."""
    base = F.when(ref_pt == "stop_position", F.lit("stop")).when(
        ref_pt == "platform", F.lit("platform")
    )
    applicable = ref_pt.isin("stop_position", "platform")
    return (
        F.when(~applicable | ref_pt.isNull(), role)
        .when(role.endswith("_exit_only"), F.concat(base, F.lit("_exit_only")))
        .when(role.endswith("_entry_only"), F.concat(base, F.lit("_entry_only")))
        .otherwise(role)
    )


_F14_BUS = ("bus", "trolley_bus", "share_taxi")
_F14_RAIL = ("railway", "tram", "subway", "light_rail")


def _empty_map() -> Column:
    # built lazily: Column construction needs an active SparkSession
    return F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )


def mode_tags_for_stop(pt_type: Column, modes: Column) -> Column:
    """F14: OSM mode tags by stop type x served route modes
    (io/GTFSReadIn.java:566-623 getModeTagsByBusStop) as a map column.

    - platform: bus-ish -> highway=bus_stop; rail-ish -> railway=paltform
      ('paltform' [sic] is the reference's literal output — reproduced
      for parity, GTFSReadIn.java:585);
    - stop_position: <mode>=yes per distinct served mode;
    - station: bus -> amenity=bus_station, rail-ish -> railway=station,
      ferry -> amenity=ferry_terminal.
    `modes` is the array of OSM route-mode values serving the stop (A3
    grouping output); funicular/aerialway station extras follow the same
    when-branch pattern via the 'funicular'/'aerialway' mode values.
    """
    has = lambda *vals: F.arrays_overlap(  # noqa: E731
        modes, F.array(*[F.lit(v) for v in vals])
    )

    def _m(*kv: str) -> Column:
        return F.create_map(*[F.lit(x) for x in kv])

    platform_map = F.map_concat(
        F.when(has(*_F14_BUS), _m("highway", "bus_stop")).otherwise(_empty_map()),
        F.when(has(*_F14_RAIL), _m("railway", "paltform")).otherwise(_empty_map()),
    )
    clean = F.array_distinct(F.filter(modes, lambda m: m.isNotNull()))
    stoppos_map = F.map_from_arrays(clean, F.transform(clean, lambda m: F.lit("yes")))
    station_map = F.map_concat(
        F.when(has("bus"), _m("amenity", "bus_station")).otherwise(_empty_map()),
        F.when(has(*_F14_RAIL), _m("railway", "station")).otherwise(_empty_map()),
        F.when(has("ferry"), _m("amenity", "ferry_terminal")).otherwise(_empty_map()),
        F.when(
            has("funicular"), _m("railway", "station", "station", "funicular")
        ).otherwise(_empty_map()),
        F.when(has("aerialway"), _m("aerialway", "station")).otherwise(_empty_map()),
    )
    return (
        F.when(pt_type == "platform", platform_map)
        .when(pt_type == "stop_position", stoppos_map)
        .when(pt_type == "station", station_map)
        .otherwise(_empty_map())
    )
