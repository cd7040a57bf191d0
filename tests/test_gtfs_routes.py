"""GTFS sources, route-variant operators, and report sinks vs
hand-computed expectations (reference semantics cited in the modules)."""

import glob
import os

import pytest

from pyspark.sql import functions as F

from gtfs_osm_sync_spark.sources import gtfs as G
from gtfs_osm_sync_spark.sources import sinks as K
from gtfs_osm_sync_spark.operators import routes as R


@pytest.fixture(scope="module")
def gtfs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gtfs")
    (d / "stops.txt").write_text(
        "﻿stop_id,stop_name,stop_lat,stop_lon,location_type,wheelchair_boarding,custom_col\n"
        "7,Main  St &  1st,28.05,-82.45,0,1,x\n"
        "23,Second St,28.06,-82.46,1,2,y\n"
        "105,Third St,28.07,-82.47,,0,z\n"
    )
    (d / "routes.txt").write_text(
        "route_id,route_short_name,route_long_name,route_type,route_color\n"
        "R1,6,Sixth Ave,3,FF0000\n"
        "R2,30,Thirtieth St,6,FFFFFF\n"
        "R3,9,Ninth St,7,0000ff\n"
    )
    (d / "trips.txt").write_text(
        "route_id,service_id,trip_id\nR1,S,T1\nR1,S,T2\nR1,S,T3\nR2,S,T4\n"
    )
    (d / "stop_times.txt").write_text(
        "trip_id,arrival_time,departure_time,stop_id,stop_sequence,pickup_type,drop_off_type\n"
        "T1,08:00:00,08:00:30,7,1,0,0\n"
        "T1,08:10:00,08:10:30,23,2,0,0\n"
        "T1,08:20:00,08:20:30,105,3,1,0\n"
        "T2,09:00:00,09:00:30,7,1,0,0\n"
        "T2,09:10:00,09:10:30,23,2,0,0\n"
        "T2,09:20:00,09:20:30,105,3,1,0\n"
        "T3,10:00:00,10:00:30,7,1,0,0\n"
        "T3,10:30:00,10:30:30,105,2,0,0\n"
        "T4,23:50:00,23:55:00,23,1,0,0\n"
        "T4,25:10:00,25:15:00,7,2,0,1\n"
    )
    (d / "agency.txt").write_text(
        "agency_name,agency_url,agency_timezone\nHillsborough Area Regional Transit,http://x,US/Eastern\n"
    )
    return str(d)


def test_read_stops_mapping(spark, gtfs_dir):
    df = G.read_stops(spark, f"{gtfs_dir}/stops.txt", id_digits=4, operator="HART")
    rows = {r["gtfs_id"]: r for r in df.collect()}
    assert set(rows) == {"0007", "0023", "0105"}  # zero-pad (F2) + BOM stripped
    assert rows["0007"]["name"] == "Main St & 1st"  # whitespace squeeze (F16)
    assert rows["0007"]["public_transport"] == "platform"  # F8
    assert rows["0023"]["public_transport"] == "station"
    assert rows["0007"]["wheelchair"] == "limited" and rows["0023"]["wheelchair"] == "no"
    assert rows["0105"]["wheelchair"] == ""
    assert rows["0007"]["gtfs_custom_col"] == "x"  # dynamic-schema rule
    assert isinstance(rows["0007"]["lat"], float)


def test_read_routes_mapping(spark, gtfs_dir):
    df = G.read_routes(spark, f"{gtfs_dir}/routes.txt")
    rows = {r["route_id"]: r for r in df.collect()}
    assert rows["R1"]["osm_mode"] == "bus" and rows["R1"]["osm_mode_key"] == "route"
    assert rows["R2"]["osm_mode"] == "yes" and rows["R2"]["osm_mode_key"] == "aerialway"
    assert rows["R3"]["osm_mode"] == "funicular" and rows["R3"]["osm_mode_key"] == "railway"
    assert rows["R1"]["colour"] == "#FF0000"  # F11
    assert rows["R2"]["colour"] is None  # FFFFFF dropped
    assert rows["R3"]["colour"] == "#0000ff"


def test_agency(spark, gtfs_dir):
    assert G.read_agency(spark, f"{gtfs_dir}/agency.txt").startswith("Hillsborough")


def test_route_variants_dedup(spark, gtfs_dir):
    st = G.read_stop_times(spark, f"{gtfs_dir}/stop_times.txt")
    trips = G.read_trips(spark, f"{gtfs_dir}/trips.txt")
    v = R.route_variants(st, trips).collect()
    by_id = {r["variant_id"]: r for r in v}
    # T1 and T2 share the same (stop, pickup, dropoff) sequence -> one variant
    assert by_id["T1"]["same_trip_sequences"] == ["T1", "T2"]
    assert by_id["T1"]["n_trips"] == 2
    assert "T3" in by_id and by_id["T3"]["n_trips"] == 1
    assert len(v) == 3  # {T1,T2}, {T3}, {T4}


def test_variant_summary_duration_over_24h(spark, gtfs_dir):
    st = G.read_stop_times(spark, f"{gtfs_dir}/stop_times.txt")
    trips = G.read_trips(spark, f"{gtfs_dir}/trips.txt")
    routes = G.read_routes(spark, f"{gtfs_dir}/routes.txt")
    s = {r["variant_id"]: r for r in R.variant_summary(R.route_variants(st, trips), routes).collect()}
    assert s["T1"]["from_stop"] == "7" and s["T1"]["to_stop"] == "105"
    assert s["T1"]["duration"] == "00:19"  # 08:00:30 -> 08:20:00 = 19.5 min -> 00:19
    assert s["T4"]["duration"] == "01:15"  # 23:55 -> 25:10 crosses 24h (GTFS times)
    assert s["T1"]["variant_name"] == "Bus 6: 7 => 105"


def test_stop_to_routes(spark, gtfs_dir):
    st = G.read_stop_times(spark, f"{gtfs_dir}/stop_times.txt")
    trips = G.read_trips(spark, f"{gtfs_dir}/trips.txt")
    m = {r["stop_id"]: r["route_ref"] for r in R.stop_to_routes(st, trips).collect()}
    assert m["7"] == "R1;R2" and m["23"] == "R1;R2" and m["105"] == "R1"


def test_scored_route_match_tie_decrement(spark):
    gtfs = spark.createDataFrame(
        [("T1", "sigA", "R1", "6"), ("T2", "sigB", "R1", "6")],
        "trip_id string, variant_sig string, route_id string, route_ref string",
    )
    rels = spark.createDataFrame(
        [
            ("rel1", "T1", None, None, None),  # trip match -> 1000
            ("rel2", None, "sigB", None, None),  # variant match -> 900
            ("rel3", None, None, "R1", None),  # route match -> 600
            ("rel4", None, None, "R1", None),  # second route match -> 599
        ],
        "rel_id string, rel_trip_id string, rel_variant_sig string, "
        "rel_route_id string, rel_route_ref string",
    )
    out = {r["trip_id"]: r for r in R.scored_route_match(gtfs, rels).collect()}
    assert out["T1"]["rel_id"] == "rel1" and out["T1"]["score"] == 1000
    assert out["T2"]["rel_id"] == "rel2" and out["T2"]["score"] == 900


def test_export_csv_and_xml(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("0007", "Main & <St>", 28.05, -82.45, {"name": "Main & <St>", "highway": "bus_stop"}, "UPLOAD_CONFLICT", 3, 123),
            ("0023", "Second", 28.06, -82.46, {"name": "Second"}, "NOTHING_NEW", 1, 456),
        ],
        "gtfs_id string, name string, lat double, lon double, "
        "tags map<string,string>, category string, version int, osm_id long",
    )
    out = str(tmp_path / "k1")
    K.export_stops_csv(df, out, with_tags=True, conflicts_only=True)
    csv = open(glob.glob(os.path.join(out, "*.csv"))[0]).read()
    assert "0007" in csv and "0023" not in csv
    assert "highway=bus_stop|name=Main & <St>" in csv  # sorted k=v|k=v

    xml = K.osm_change_xml(create=df.filter("gtfs_id='0007'"), modify=df.filter("gtfs_id='0023'"), delete=None, changeset="9")
    assert '<node id="-1"' in xml  # temp id for create
    assert '<node id="456"' in xml  # osm id for modify
    assert "Main &amp; &lt;St&gt;" in xml  # F3 escaping
    assert xml.count("<create>") == 1 and xml.count("<modify>") == 1
    assert "<delete>" not in xml


def test_invert_changeset(spark):
    df = spark.createDataFrame(
        [("1", "create"), ("2", "delete"), ("3", "modify")], "id string, action string"
    )
    got = {r["id"]: r["action"] for r in K.invert_changeset(df).collect()}
    assert got == {"1": "delete", "2": "create", "3": "modify"}


def test_build_route_relations_end_to_end(spark):
    """The route-upload composition: variants -> members in sequence
    order with F12 roles, gtfs_id-resolved refs, F13 rewrite against the
    referenced node's public_transport, temp ids for unmatched stops —
    serialized through the K4 relation sink and parsed back."""
    from pyspark.sql import types as T
    import xml.etree.ElementTree as ET
    import io

    from gtfs_osm_sync_spark.operators.routes import build_route_relations
    from gtfs_osm_sync_spark.sources import sinks

    stop_struct = (
        "array<struct<stop_sequence:int,stop_id:string,pickup_type:int,"
        "drop_off_type:int,arrival_time:string,departure_time:string>>"
    )
    variants = spark.createDataFrame(
        [
            (
                "R1",
                "trip001",
                [
                    (1, "0100", 0, 0, "08:00:00", "08:00:00"),   # platform
                    (2, "0200", 1, 2, "08:05:00", "08:05:00"),   # exit_only (d=2 counts as !=1)
                    (3, "0300", 2, 1, "08:10:00", "08:10:00"),   # entry_only
                    (4, "9999", 0, 0, "08:15:00", "08:15:00"),   # no OSM node -> temp id
                ],
            )
        ],
        f"route_id string, variant_id string, stops {stop_struct}",
    )
    nodes = spark.createDataFrame(
        [
            ("n100", "1", "u", "t", 1.0, 2.0, {"gtfs_id": "0100", "public_transport": "stop_position"}, 0, 0),
            ("n200", "1", "u", "t", 1.0, 2.1, {"gtfs_id": "0200", "public_transport": "stop_position"}, 0, 1),
            ("n300", "1", "u", "t", 1.0, 2.2, {"gtfs_id": "0300"}, 0, 2),
        ],
        "osm_id string, version string, user string, timestamp string, lat double,"
        " lon double, tags map<string,string>, file_idx int, elem_idx long",
    )
    rel = build_route_relations(variants, nodes, operator_full="Metro Transit")
    row = rel.collect()[0]
    got = [(m["ref"], m["role"]) for m in row["members"]]
    assert got == [
        ("n100", "platform"),             # F13: bare role kept (reference quirk)
        ("n200", "stop_exit_only"),       # F13 rewrote platform_exit_only vs stop_position
        ("n300", "platform_entry_only"),  # node has no pt value -> role unchanged
        ("-4", "platform"),               # unmatched stop -> position temp id
    ]
    assert row["tags"]["type"] == "route" and row["tags"]["ref"] == "R1"

    xml = sinks.osm_change_xml(rel.drop("route_id"), None, None, changeset="DUMMY")
    parsed = ET.parse(io.StringIO(xml)).getroot()
    members = parsed.find("create").find("relation").findall("member")
    assert [(m.get("ref"), m.get("role")) for m in members] == got
