"""GTFS CSV sources (SURVEY §2.1 S1-S5) as DataFrame readers.

The reference reads GTFS CSVs with a header-driven dynamic schema and
maps known headers to OSM tag keys (io/GTFSReadIn.java:91-253). Here each
reader is a `spark.read.csv` + a declarative projection; the "unknown
header -> gtfs_<col>" rule becomes a rename pass over df.columns (plan
time, not data time — zero runtime cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.mappings import (
    location_type_to_osm,
    normalize_color,
    route_type_to_key,
    route_type_to_mode,
    squeeze_whitespace,
    wheelchair_to_osm,
    zero_pad_id,
)

# GTFS header -> OSM tag key projection (GTFSReadIn.java:116-154,
# tag key constants tag_defs.java:12-85)
KNOWN_STOP_COLUMNS = {
    "stop_id": "gtfs_id",
    "stop_name": "name",
    "stop_desc": "description",
    "stop_lat": "lat",
    "stop_lon": "lon",
    "stop_url": "url",
    "zone_id": "gtfs_zone_id",
    "location_type": "location_type",
    "wheelchair_boarding": "wheelchair",
    "stop_code": "gtfs_stop_code",
}


def _read_csv(spark: SparkSession, path: str) -> DataFrame:
    """UTF-8 CSV with header; BOM on the first header cell is stripped
    (the reference strips it manually, GTFSReadIn.java:100-104)."""
    df = spark.read.option("header", True).option("encoding", "UTF-8").csv(path)
    first = df.columns[0]
    if first.startswith("﻿"):
        df = df.withColumnRenamed(first, first.lstrip("﻿"))
    return df


def read_stops(
    spark: SparkSession, path: str, id_digits: int = 0, operator: str | None = None
) -> DataFrame:
    """S1: stops.txt -> typed stops frame with OSM-mapped columns.

    - known headers renamed per KNOWN_STOP_COLUMNS;
    - unknown headers kept as gtfs_<col> (dynamic schema rule);
    - stop_id zero-padded to id_digits when > 0 (S11, OsmFormatter.java:36-42);
    - location_type / wheelchair codes mapped to OSM values (F8/F9);
    - lat/lon cast to double at ingest (the reference keeps strings and
      parses at every use, SURVEY §1.2 — pinned deviation).
    """
    df = _read_csv(spark, path)
    for col in df.columns:
        if col in KNOWN_STOP_COLUMNS:
            df = df.withColumnRenamed(col, KNOWN_STOP_COLUMNS[col])
        else:
            df = df.withColumnRenamed(col, f"gtfs_{col}")
    if "gtfs_id" in df.columns and id_digits > 0:
        df = df.withColumn("gtfs_id", zero_pad_id(F.col("gtfs_id"), id_digits))
    # raw string copies survive for byte-parity exports (the reference's
    # Stop keeps lat/lon/name as the raw CSV strings; WriteFile emits them
    # verbatim — exportStops, io/WriteFile.java:236-246)
    df = (
        df.withColumn("lat_raw", F.col("lat"))
        .withColumn("lon_raw", F.col("lon"))
        .withColumn("lat", F.col("lat").cast("double"))
        .withColumn("lon", F.col("lon").cast("double"))
    )
    if "name" in df.columns:
        df = df.withColumn("name_raw", F.col("name")).withColumn(
            "name", squeeze_whitespace(F.col("name"))
        )
    if "location_type" in df.columns:
        df = df.withColumn(
            "public_transport", location_type_to_osm(F.col("location_type"))
        )
    if "wheelchair" in df.columns:
        df = df.withColumn("wheelchair", wheelchair_to_osm(F.col("wheelchair")))
    if operator:
        df = df.withColumn("operator", F.lit(operator))
    return df


def read_routes(spark: SparkSession, path: str) -> DataFrame:
    """S2: routes.txt with route_type -> OSM mode/key and colour
    normalization (GTFSReadIn.java:255-382, F10/F11)."""
    df = _read_csv(spark, path)
    if "route_type" in df.columns:
        df = df.withColumn("osm_mode", route_type_to_mode(F.col("route_type")))
        df = df.withColumn("osm_mode_key", route_type_to_key(F.col("route_type")))
    if "route_color" in df.columns:
        df = df.withColumn("colour", normalize_color(F.col("route_color")))
    if "route_short_name" in df.columns:
        df = df.withColumn("route_ref", squeeze_whitespace(F.col("route_short_name")))
    return df


def read_trips(spark: SparkSession, path: str) -> DataFrame:
    """S3: trips.txt -> (trip_id, route_id) dimension (GTFSReadIn.java:508-529).
    Broadcast this at join sites."""
    return _read_csv(spark, path).select("trip_id", "route_id")


def read_stop_times(spark: SparkSession, path: str) -> DataFrame:
    """S4: stop_times.txt, typed."""
    df = _read_csv(spark, path)
    df = df.withColumn("stop_sequence", F.col("stop_sequence").cast("int"))
    for c in ("pickup_type", "drop_off_type"):
        if c in df.columns:
            df = df.withColumn(c, F.coalesce(F.col(c).cast("int"), F.lit(0)))
    return df


def read_agency(spark: SparkSession, path: str) -> str:
    """S5: agency.txt first row -> agency name (GTFSReadIn.java:69-89)."""
    row = _read_csv(spark, path).select("agency_name").limit(1).collect()
    return row[0]["agency_name"] if row else ""
