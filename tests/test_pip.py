"""Point-in-polygon: ray-casting UDF + bbox-pruned join vs brute force."""

import numpy as np
import pandas as pd

from gtfs_osm_sync_spark import synth
from gtfs_osm_sync_spark.operators import pip as PIP
from gtfs_osm_sync_spark.operators.spatial_join import geotag_images

N_IMAGES = 2500


def test_wkb_roundtrip():
    coords = [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
    wkb = synth.wkb_polygon(coords)
    ring = PIP.parse_wkb_polygon(wkb)
    assert ring.shape == (5, 2)  # auto-closed
    assert (ring[0] == ring[-1]).all()
    assert ring[0][0] == -1.0 and ring[2][1] == 1.0


def test_ray_casting_square():
    ring = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0]])
    lat = np.array([0.0, 0.0, 2.0, 0.999, -0.999, 1.5])
    lon = np.array([0.0, 2.0, 0.0, 0.999, -0.999, 1.5])
    got = PIP.point_in_ring_np(lat, lon, ring)
    assert list(got) == [True, False, False, True, True, False]


def test_ray_casting_concave():
    # arrow-head concave polygon: (0,0),(4,0),(4,4),(2,1.5),(0,4)
    ring = np.array([[0, 0], [4, 0], [4, 4], [2, 1.5], [0, 4], [0, 0]], dtype=float)
    # (2, 3) sits in the concave notch -> outside; (1, 1) inside
    got = PIP.point_in_ring_np(np.array([3.0, 1.0]), np.array([2.0, 1.0]), ring)
    assert list(got) == [False, True]


def test_pip_join_matches_bruteforce(spark):
    images = synth.generate_images(spark, N_IMAGES, partitions=6)
    geo = geotag_images(images).select("image_id", "lat", "lon")
    polys = synth.generate_polygons(spark)
    got = (
        PIP.pip_join(geo, polys)
        .select("image_id", "poly_id")
        .toPandas()
        .sort_values(["image_id", "poly_id"])
        .reset_index(drop=True)
    )

    # brute force: every image x every polygon, no bbox pruning
    ids = np.arange(0, N_IMAGES)
    ph = synth.splitmix64(ids.astype(np.uint64)).view(np.int64)
    lat, lon = synth.phash_latlon_np(ph)
    ppdf = polys.toPandas()
    rows = []
    for _, p in ppdf.iterrows():
        ring = PIP.parse_wkb_polygon(p["wkb"])
        inside = PIP.point_in_ring_np(lat, lon, ring)
        for i in np.nonzero(inside)[0]:
            rows.append((f"img{int(ids[i]):012d}", p["poly_id"]))
    want = (
        pd.DataFrame(rows, columns=["image_id", "poly_id"])
        .sort_values(["image_id", "poly_id"])
        .reset_index(drop=True)
    )
    assert len(want) > 100, "fixture produced too few PIP hits"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
