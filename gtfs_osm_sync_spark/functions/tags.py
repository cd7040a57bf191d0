"""Open tag-map algebra over MapType columns (SURVEY §2.8 F5-F7).

The reference keeps entity attributes in an open Hashtable<String,String>
(object/OsmPrimitive.java:30-42); here that is a first-class
MapType(string,string) column and the diff/merge rules become pure map
expressions (map_filter / transform_values / map_concat) — fully
codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tag_diff(new_tags: Column, osm_tags: Column) -> Column:
    """F5: per-key diff of new (GTFS-derived) tags vs existing OSM tags
    (task/CompareData.java:443-467):

    - key missing in OSM            -> take new value
    - values equal (case-insens.)   -> no entry (not a diff)
    - OSM value *contains* new      -> keep OSM value
    - otherwise                     -> 'new;osm' concat (both kept)

    Returns a map of only the keys that need writing.
    """
    osm = osm_tags

    def diff_value(k: Column, v: Column) -> Column:
        ov = F.element_at(osm, k)
        return (
            F.when(ov.isNull(), v)
            .when(F.upper(ov) == F.upper(v), F.lit(None))
            .when(F.instr(F.upper(ov), F.upper(v)) > 0, F.lit(None))
            .otherwise(F.concat(v, F.lit(";"), ov))
        )

    candidate = F.transform_values(new_tags, diff_value)
    return F.map_filter(candidate, lambda k, v: v.isNotNull())


def tag_merge_keep_existing(new_tags: Column, old_tags: Column) -> Column:
    """F6: merge without overwriting existing keys
    (OsmPrimitive.addTags, OsmPrimitive.java:59-79): old wins on conflict.
    """
    only_new = F.map_filter(
        new_tags, lambda k, v: ~F.map_contains_key(old_tags, k)
    )
    return F.map_concat(old_tags, only_new)


def tag_merge_overwrite(new_tags: Column, old_tags: Column) -> Column:
    """F7: merge with overwrite (addAndOverwriteTags,
    OsmPrimitive.java:81-92); empty values become the 'none' sentinel
    (OsmPrimitive.java:44-53)."""
    sentineled = F.transform_values(
        new_tags, lambda k, v: F.coalesce(F.nullif(v, F.lit("")), F.lit("none"))
    )
    keep_old = F.map_filter(old_tags, lambda k, v: ~F.map_contains_key(sentineled, k))
    return F.map_concat(keep_old, sentineled)


def tags_to_kv_string(tags: Column) -> Column:
    """Serialize a tag map as 'k=v|k=v' sorted by key (the reference's CSV
    export format, io/WriteFile.java:214-294; we pin lexical key order —
    documented deviation from Java hashCode order, SURVEY §4)."""
    entries = F.array_sort(F.map_entries(tags))
    return F.concat_ws(
        "|", F.transform(entries, lambda e: F.concat(e["key"], F.lit("="), e["value"]))
    )


def operator_matches(osm_operator: Column, aliases: list[str]) -> Column:
    """P3: fuzzy operator predicate (object/OperatorInfo.java:112-126):
    case-insensitive substring containment in either direction against any
    alias. NULL operator -> treated as match=False."""
    up = F.upper(F.coalesce(osm_operator, F.lit("")))
    cond = F.lit(False)
    for a in aliases:
        al = F.lit(a.upper())
        cond = cond | up.contains(al) | al.contains(up) & (F.length(up) > 0)
    return cond


def fixme_filter(tags: Column) -> Column:
    """P6: nodes already tagged FIXME are not re-flagged
    (CompareData.java:1038,1169). True = keep for processing."""
    return ~F.map_contains_key(tags, F.lit("FIXME"))


def negative_id_filter(ref: Column) -> Column:
    """P7: relation members with negative (temporary) ids are skipped on
    save (gui/ReportViewer.java:1298-1305)."""
    return ~ref.cast("string").startswith("-")


def member_role_filter(
    role: Column,
    pt_type: Column,
    in_gtfs: Column,
    skip_empty_role: bool = True,
    skip_stop_positions: bool = True,
    skip_platforms_not_in_gtfs: bool = True,
) -> Column:
    """P8: PTv2 member skip rules (gui/ReportViewer.java:1400-1439;
    options object/ProcessingOptions.java:32-36). True = keep."""
    keep = F.lit(True)
    if skip_empty_role:
        keep = keep & ~(F.coalesce(role, F.lit("")) == "")
    if skip_stop_positions:
        keep = keep & ~(F.coalesce(pt_type, F.lit("")) == "stop_position")
    if skip_platforms_not_in_gtfs:
        keep = keep & ~(
            (F.coalesce(pt_type, F.lit("")) == "platform") & ~F.coalesce(in_gtfs, F.lit(False))
        )
    return keep
