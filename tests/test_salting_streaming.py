"""Explicit salting equivalence + streaming ingest effectively-once."""

import pandas as pd
from pyspark.sql import functions as F

from gtfs_osm_sync_spark import synth
from gtfs_osm_sync_spark.operators.spatial_join import geotag_images, radius_join
from gtfs_osm_sync_spark.sources.snaptable import SnapTable
from gtfs_osm_sync_spark.streaming.ingest import stream_images_to_table


def _pairs(df):
    return (
        df.select("image_id", "feature_id")
        .toPandas()
        .sort_values(["image_id", "feature_id"])
        .reset_index(drop=True)
    )


def test_salted_shuffle_join_equals_broadcast(spark):
    geo = geotag_images(synth.generate_images(spark, 2000, partitions=4)).drop("bytes")
    feats = synth.generate_features(spark, 2000, 40)
    base = _pairs(radius_join(geo, feats, broadcast_features=True))
    shuffled = _pairs(radius_join(geo, feats, broadcast_features=False))
    salted = _pairs(radius_join(geo, feats, broadcast_features=False, n_salt=8))
    assert len(base) > 20
    pd.testing.assert_frame_equal(base, shuffled)
    pd.testing.assert_frame_equal(base, salted)


def test_salted_plan_has_composite_key(spark):
    geo = geotag_images(synth.generate_images(spark, 500, partitions=2)).drop("bytes")
    feats = synth.generate_features(spark, 500, 10)
    plan = radius_join(
        geo, feats, broadcast_features=False, n_salt=4
    )._jdf.queryExecution().toString()
    assert "_salt" in plan


def test_streaming_ingest_effectively_once(spark, tmp_path):
    src = str(tmp_path / "drops")
    table_root = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    imgs = synth.generate_images(spark, 300, partitions=3)
    imgs.write.mode("overwrite").parquet(src)

    stream_images_to_table(
        spark, src, table_root, synth.IMAGES_SCHEMA, checkpoint_dir=ckpt
    )
    t = SnapTable(table_root)
    n1 = t.read(spark).count()
    assert n1 == 300
    got = t.read(spark).select("image_id", "hex_cell").toPandas()
    assert got["hex_cell"].notna().all()

    # drain again with the same checkpoint: no new data -> no new rows;
    # and a replayed batch id would be skipped by the ledger
    stream_images_to_table(
        spark, src, table_root, synth.IMAGES_SCHEMA, checkpoint_dir=ckpt
    )
    assert t.read(spark).count() == 300
