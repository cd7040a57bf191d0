"""Tag diff/merge truth tables mirroring CompareData.java:443-467 and
OsmPrimitive.java:44-92."""

from pyspark.sql import functions as F

from gtfs_osm_sync_spark.functions import tags as TG


def _one(spark, new, osm):
    df = spark.createDataFrame(
        [(new, osm)], "new_tags map<string,string>, osm_tags map<string,string>"
    )
    return df


def test_tag_diff_truth_table(spark):
    new = {"name": "Main St", "ref": "12", "operator": "METRO", "url": "x.org"}
    osm = {"name": "main st", "operator": "Metro Transit METRO", "url": "y.org"}
    out = (
        _one(spark, new, osm)
        .select(TG.tag_diff(F.col("new_tags"), F.col("osm_tags")).alias("d"))
        .collect()[0]["d"]
    )
    # name equal case-insensitively -> dropped; ref missing in OSM -> taken;
    # operator contained in OSM value -> dropped; url conflict -> concat
    assert out == {"ref": "12", "url": "x.org;y.org"}


def test_tag_merge_keep_existing(spark):
    new = {"a": "1", "b": "2"}
    old = {"b": "KEEP", "c": "3"}
    out = (
        _one(spark, new, old)
        .select(TG.tag_merge_keep_existing(F.col("new_tags"), F.col("osm_tags")).alias("m"))
        .collect()[0]["m"]
    )
    assert out == {"a": "1", "b": "KEEP", "c": "3"}


def test_tag_merge_overwrite_and_none_sentinel(spark):
    new = {"a": "", "b": "2"}
    old = {"a": "OLD", "c": "3"}
    out = (
        _one(spark, new, old)
        .select(TG.tag_merge_overwrite(F.col("new_tags"), F.col("osm_tags")).alias("m"))
        .collect()[0]["m"]
    )
    # empty new value -> 'none' sentinel (OsmPrimitive.java:44-53); new wins
    assert out == {"a": "none", "b": "2", "c": "3"}


def test_tags_to_kv_string_sorted(spark):
    out = (
        _one(spark, {"z": "1", "a": "2", "m": "x"}, {})
        .select(TG.tags_to_kv_string(F.col("new_tags")).alias("s"))
        .collect()[0]["s"]
    )
    assert out == "a=2|m=x|z=1"


def test_operator_matches_fuzzy(spark):
    df = spark.createDataFrame(
        [("Metro Transit Authority",), ("METRO",), ("metro transit",), ("City Bus",), (None,)],
        "op string",
    )
    out = df.select(
        TG.operator_matches(F.col("op"), ["Metro Transit", "MT"]).alias("m")
    ).collect()
    got = [r["m"] for r in out]
    # containment either direction, case-insensitive (OperatorInfo.java:112-126)
    assert got == [True, True, True, False, False]
