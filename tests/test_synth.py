"""Synthetic data generator invariants: determinism across partitionings,
schema stability, codec roundtrip of generated payloads, skew presence."""

import numpy as np
import pandas as pd

from gtfs_osm_sync_spark import synth
from gtfs_osm_sync_spark.functions.codecs import decode_image, psnr


def test_gen_images_deterministic_across_batching():
    a = synth.gen_images_pdf(np.arange(0, 50))
    b = pd.concat(
        [synth.gen_images_pdf(np.arange(0, 17)), synth.gen_images_pdf(np.arange(17, 50))]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_generated_payloads_decode():
    pdf = synth.gen_images_pdf(np.arange(0, 40))
    for _, row in pdf.iterrows():
        img = decode_image(row["bytes"], row["fmt"])
        assert img.shape == (row["h"], row["w"], 3)
        # re-encode decoded pixels: for png exact; for lossy stand-in the
        # decode of an encode of a decode is stable (idempotent quantizer)
        if row["fmt"] == "jpeg":
            # phash is a signed int64; mask to the unsigned value in pure
            # Python (np.uint64(negative) is a NumPy deprecation -> future
            # hard error)
            orig = synth.pixels_for(
                int(row["phash"]) & 0xFFFFFFFFFFFFFFFF, row["h"], row["w"]
            )
            assert psnr(orig, img) >= 40.0


def test_phash_latlon_bounds_and_determinism():
    ph = synth.splitmix64(np.arange(0, 20000).astype(np.uint64)).view(np.int64)
    lat, lon = synth.phash_latlon_np(ph)
    lat2, lon2 = synth.phash_latlon_np(ph)
    assert np.array_equal(lat, lat2) and np.array_equal(lon, lon2)
    assert lat.min() >= -90 and lat.max() <= 90
    assert lon.min() >= -180 and lon.max() <= 180


def test_urban_skew_exists():
    ph = synth.splitmix64(np.arange(0, 50000).astype(np.uint64))
    cl = synth.cluster_of(ph)
    counts = np.bincount(cl, minlength=synth.N_CLUSTERS)
    urban = counts[:: synth.URBAN_MOD]
    rural = np.delete(counts, np.arange(0, synth.N_CLUSTERS, synth.URBAN_MOD))
    # urban clusters carry ~9x the per-cluster mass
    assert urban.mean() > 5 * rural.mean()


def test_spark_generation_matches_local(spark):
    df = synth.generate_images(spark, 200, partitions=7).orderBy("image_id")
    got = df.toPandas()
    want = synth.gen_images_pdf(np.arange(0, 200))
    assert list(got["image_id"]) == list(want["image_id"])
    assert list(got["phash"]) == list(want["phash"])
    assert got["bytes"].map(bytes) .tolist() == want["bytes"].tolist()


def test_features_cover_all_categories():
    pdf = synth.gen_features_pdf(np.arange(0, 64), n_images=3200, n_features=64)
    assert pdf["gtfs_id"].notna().sum() > 0 and pdf["gtfs_id"].isna().sum() > 0
    assert pdf["feature_id"].is_unique
