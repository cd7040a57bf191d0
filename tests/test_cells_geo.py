"""Cell-index and geodesic kernel properties."""

import math

import numpy as np

from gtfs_osm_sync_spark.functions import cells, geo


def _rand(n=5000, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(-80, 80, n), rng.uniform(-179.5, 179.5, n)


def test_s2_roundtrip_leaf():
    lat, lon = _rand()
    face, i, j = cells.s2_face_ij(lat, lon)
    leaf = cells.s2_cell_from_face_ij(face, i, j, 30)
    f2, i2, j2 = cells.s2_leaf_to_face_ij(leaf)
    assert (f2 == face).all() and (i2 == i).all() and (j2 == j).all()


def test_s2_level15_center_within_cell():
    lat, lon = _rand(2000, 2)
    c = cells.s2_cell_np(lat, lon, 15)
    clat, clon = cells.s2_cell_center_latlon(c, 15)
    d = geo.haversine_m_np(lat, lon, clat, clon)
    # level-15 cells are ~300 m across; center distance < half diagonal
    assert d.max() < 300.0


def test_s2_hierarchy():
    lat, lon = _rand(2000, 3)
    c15 = cells.s2_cell_np(lat, lon, 15).view(np.uint64)
    c10 = cells.s2_cell_np(lat, lon, 10).view(np.uint64)
    lsb10 = np.uint64(1) << np.uint64(2 * (30 - 10))
    parent = (c15 & ~(np.uint64(2) * lsb10 - np.uint64(1))) | lsb10
    assert (parent == c10).all()


def test_s2_same_point_same_cell():
    lat, lon = _rand(100, 4)
    assert (cells.s2_cell_np(lat, lon, 15) == cells.s2_cell_np(lat, lon, 15)).all()


def test_s2_known_faces():
    # cube face centers: +x (0,0), +y (0,90), +z north pole, -x (0,180)
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    face, _, _ = cells.s2_face_ij(lats, lons)
    assert list(face) == [0, 1, 2, 3, 4, 5]


def test_hex_center_distance_bounded():
    lat, lon = _rand(2000, 5)
    c = cells.hex_cell_np(lat, lon, 9)
    hlat, hlon = cells.hex_cell_center_latlon(c)
    # plane-space distance must be within the hex circumradius (= edge)
    x1 = np.radians(lon) * cells.EARTH_RADIUS_M
    y1 = np.radians(lat) * cells.EARTH_RADIUS_M
    x2 = np.radians(hlon) * cells.EARTH_RADIUS_M
    y2 = np.radians(hlat) * cells.EARTH_RADIUS_M
    assert np.hypot(x1 - x2, y1 - y2).max() <= cells.hex_edge_m(9) + 1e-6


def test_hex_ring_covers_radius():
    """Covering contract: every point within R of a cell's points lies in
    the filled k-ring of that cell (k from hex_rings_needed)."""
    rng = np.random.default_rng(6)
    lat0 = rng.uniform(-55, 55, 300)
    lon0 = rng.uniform(-170, 170, 300)
    R = 400.0
    k = cells.hex_rings_needed(R, 9, 56.0)
    # displace by up to R meters in a random direction
    ang = rng.uniform(0, 2 * math.pi, 300)
    dlat = np.cos(ang) * R / 111_320.0
    dlon = np.sin(ang) * R / (111_320.0 * np.cos(np.radians(lat0)))
    c0 = cells.hex_cell_np(lat0, lon0, 9)
    c1 = cells.hex_cell_np(lat0 + dlat, lon0 + dlon, 9)
    # build k-ring sets around c1 (the feature side) and require c0 inside
    res, q1, r1 = cells.hex_cell_unpack(c1)
    _, q0, r0 = cells.hex_cell_unpack(c0)
    dq = np.abs(q0 - q1)
    dr = np.abs(r0 - r1)
    ds = np.abs((q0 + r0) - (q1 + r1))
    hexdist = np.maximum(np.maximum(dq, dr), ds)
    assert hexdist.max() <= k


def test_vincenty_against_known_values():
    # Flinders Peak -> Buninyong (the canonical Vincenty test pair):
    # 54972.271 m on WGS-84
    d = geo.vincenty_m_np(
        np.array([-37.95103341]),
        np.array([144.42486789]),
        np.array([-37.65282114]),
        np.array([143.92649554]),
    )
    assert abs(d[0] - 54972.271) < 0.05


def test_vincenty_haversine_agree():
    lat, lon = _rand(1000, 7)
    lat2, lon2 = _rand(1000, 8)
    v = geo.vincenty_m_np(lat, lon, lat2, lon2)
    h = geo.haversine_m_np(lat, lon, lat2, lon2)
    ok = np.isfinite(v)
    # ellipsoidal vs spherical: within 0.6 %
    rel = np.abs(v[ok] - h[ok]) / np.maximum(v[ok], 1.0)
    assert rel.max() < 0.006


def test_vincenty_zero_and_symmetry():
    lat, lon = _rand(200, 9)
    assert np.allclose(geo.vincenty_m_np(lat, lon, lat, lon), 0.0)
    lat2, lon2 = _rand(200, 10)
    d1 = geo.vincenty_m_np(lat, lon, lat2, lon2)
    d2 = geo.vincenty_m_np(lat2, lon2, lat, lon)
    assert np.allclose(d1, d2, rtol=1e-9, atol=1e-6)


def test_hex_parent_res0_raises():
    """A res-0 cell has no parent: hex_parent_np must raise, not pack a
    negative res into the id (ADVICE r5)."""
    import numpy as np
    import pytest

    from gtfs_osm_sync_spark.functions import cells

    c0 = cells.hex_cell_np(np.array([10.0]), np.array([20.0]), 0)
    with pytest.raises(ValueError, match="res-0"):
        cells.hex_parent_np(c0)
    # mixed arrays fail too (any res-0 member poisons the batch)
    c9 = cells.hex_cell_np(np.array([10.0]), np.array([20.0]), 9)
    with pytest.raises(ValueError, match="res-0"):
        cells.hex_parent_np(np.concatenate([c9, c0]))
