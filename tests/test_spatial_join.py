"""Flagship spatial-join operators vs an independent brute-force oracle.

The oracle reimplements the reference's semantics (nearest-wins,
(dist, feature_id) tie-break — SURVEY §4 deviations) in pandas/numpy with
NO cell index: every (image, feature) pair is evaluated, exactly like
CompareData.java:1016-1069's nested loop. Equality therefore proves both
the kNN/category logic AND that the hex-cell ring prejoin is a covering.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gtfs_osm_sync_spark import synth
from gtfs_osm_sync_spark.functions.geo import haversine_m_np
from gtfs_osm_sync_spark.operators import spatial_join as SJ

N_IMAGES = 3000
N_FEATURES = 60


@pytest.fixture(scope="module")
def data(spark):
    images = synth.generate_images(spark, N_IMAGES, partitions=8)
    features = synth.generate_features(spark, N_IMAGES, N_FEATURES)
    images_geo = SJ.geotag_images(images).select(
        "image_id", "phash", "lat", "lon", "hex_cell", "s2_cell"
    )
    # the image's equi-match key: its own index zero-padded, mirroring
    # gen_features_pdf's anchor linkage
    images_geo = images_geo.withColumn(
        "gtfs_id_img",
        F.lpad(F.regexp_replace(F.regexp_replace("image_id", "^img", ""), "^0+", ""), 8, "0"),
    )
    return images_geo, features


def _oracle_frames():
    """Brute-force pandas oracle over the same deterministic data."""
    ids = np.arange(0, N_IMAGES)
    ph = synth.splitmix64(ids.astype(np.uint64)).view(np.int64)
    ilat, ilon = synth.phash_latlon_np(ph)
    img = pd.DataFrame(
        {
            "image_id": [f"img{int(i):012d}" for i in ids],
            "gtfs_id_img": [str(int(i)).zfill(8) for i in ids],
            "lat": ilat,
            "lon": ilon,
        }
    )
    feat = synth.gen_features_pdf(np.arange(0, N_FEATURES), n_images=N_IMAGES, n_features=N_FEATURES)
    return img, feat


def _oracle_pairs(radius_m=400.0):
    img, feat = _oracle_frames()
    il = img["lat"].to_numpy()[:, None]
    io = img["lon"].to_numpy()[:, None]
    fl = feat["lat"].to_numpy()[None, :]
    fo = feat["lon"].to_numpy()[None, :]
    d = haversine_m_np(
        np.broadcast_to(il, (len(img), len(feat))),
        np.broadcast_to(io, (len(img), len(feat))),
        np.broadcast_to(fl, (len(img), len(feat))),
        np.broadcast_to(fo, (len(img), len(feat))),
    )
    ii, ff = np.nonzero(d < radius_m)
    return pd.DataFrame(
        {
            "image_id": img["image_id"].to_numpy()[ii],
            "gtfs_id_img": img["gtfs_id_img"].to_numpy()[ii],
            "feature_id": feat["feature_id"].to_numpy()[ff],
            "gtfs_id": feat["gtfs_id"].to_numpy()[ff],
            "dist_m": d[ii, ff],
        }
    )


def test_radius_join_matches_bruteforce(spark, data):
    images_geo, features = data
    got = (
        SJ.radius_join(images_geo, features)
        .select("image_id", "feature_id")
        .toPandas()
        .sort_values(["image_id", "feature_id"])
        .reset_index(drop=True)
    )
    want = (
        _oracle_pairs()[["image_id", "feature_id"]]
        .sort_values(["image_id", "feature_id"])
        .reset_index(drop=True)
    )
    assert len(want) > 50, "fixture produced too few in-radius pairs"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_knn_matches_bruteforce(spark, data):
    images_geo, features = data
    got = (
        SJ.knn_join(images_geo, features, k=5)
        .select("image_id", "feature_id", "rank_k")
        .toPandas()
        .sort_values(["image_id", "rank_k"])
        .reset_index(drop=True)
    )
    pairs = _oracle_pairs()
    pairs = pairs.sort_values(["image_id", "dist_m", "feature_id"])
    pairs["rank_k"] = pairs.groupby("image_id").cumcount() + 1
    want = (
        pairs[pairs["rank_k"] <= 5][["image_id", "feature_id", "rank_k"]]
        .sort_values(["image_id", "rank_k"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_categorize_matches_bruteforce(spark, data):
    images_geo, features = data
    got = (
        SJ.categorize_matches(images_geo, features)
        .select("image_id", "category")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pairs = _oracle_pairs()
    pairs["id_match"] = (
        pairs["gtfs_id"].notna() & (pairs["gtfs_id"] == pairs["gtfs_id_img"])
    ).astype(int)
    pairs = pairs.sort_values(
        ["image_id", "id_match", "dist_m", "feature_id"],
        ascending=[True, False, True, True],
    )
    best = pairs.groupby("image_id").head(1)
    img, _ = _oracle_frames()
    merged = img[["image_id"]].merge(best, on="image_id", how="left")
    conds = [
        merged["id_match"].isna(),
        (merged["id_match"] == 1) & (merged["dist_m"] <= SJ.ERROR_TO_ZERO_M),
        merged["id_match"] == 1,
    ]
    merged["category"] = np.select(
        conds, ["UPLOAD_NO_CONFLICT", "NOTHING_NEW", "MODIFY"], "UPLOAD_CONFLICT"
    )
    want = merged[["image_id", "category"]].sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every branch of CompareData.java:1059-1287 must actually occur
    assert set(want["category"].unique()) == {
        "NOTHING_NEW",
        "MODIFY",
        "UPLOAD_CONFLICT",
        "UPLOAD_NO_CONFLICT",
    }


def test_knn_subset_of_radius(spark, data):
    images_geo, features = data
    knn = SJ.knn_join(images_geo, features, k=5).select("image_id", "feature_id")
    rad = SJ.radius_join(images_geo, features).select("image_id", "feature_id")
    assert knn.exceptAll(rad).count() == 0
