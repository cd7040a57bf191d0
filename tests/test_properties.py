"""Property-based spot checks (SURVEY §5.4): distance kernel laws, cell
covering, tag-algebra laws — hypothesis-driven, numpy/pure-python only
(no Spark session needed, so these run in milliseconds)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gtfs_osm_sync_spark.functions import cells, geo
from gtfs_osm_sync_spark.operators.pip import point_in_ring_np
from gtfs_osm_sync_spark.synth import wkb_polygon
from gtfs_osm_sync_spark.operators.pip import parse_wkb_polygon

lat_st = st.floats(min_value=-80, max_value=80, allow_nan=False, width=64)
lon_st = st.floats(min_value=-179.5, max_value=179.5, allow_nan=False, width=64)


@settings(max_examples=200, deadline=None)
@given(lat_st, lon_st, lat_st, lon_st)
def test_haversine_laws(lat1, lon1, lat2, lon2):
    a = geo.haversine_m_np(np.array([lat1]), np.array([lon1]), np.array([lat2]), np.array([lon2]))[0]
    b = geo.haversine_m_np(np.array([lat2]), np.array([lon2]), np.array([lat1]), np.array([lon1]))[0]
    assert a == b  # symmetry (identical op order -> bit-equal)
    assert a >= 0.0
    assert a <= np.pi * geo.EARTH_RADIUS_M + 1e-6  # bounded by half circumference
    same = geo.haversine_m_np(np.array([lat1]), np.array([lon1]), np.array([lat1]), np.array([lon1]))[0]
    assert same == 0.0


@settings(max_examples=100, deadline=None)
@given(lat_st, lon_st, lat_st, lon_st)
def test_vincenty_close_to_haversine(lat1, lon1, lat2, lon2):
    v = geo.vincenty_m_np(np.array([lat1]), np.array([lon1]), np.array([lat2]), np.array([lon2]))[0]
    h = geo.haversine_m_np(np.array([lat1]), np.array([lon1]), np.array([lat2]), np.array([lon2]))[0]
    assert np.isfinite(v) and v >= 0
    # ellipsoid vs sphere flattening bound
    assert abs(v - h) <= 0.006 * max(v, 1.0)


@settings(max_examples=200, deadline=None)
@given(lat_st, lon_st)
def test_s2_cell_contains_its_point(lat, lon):
    c = cells.s2_cell_np(np.array([lat]), np.array([lon]), 15)
    clat, clon = cells.s2_cell_center_latlon(c, 15)
    d = geo.haversine_m_np(np.array([lat]), np.array([lon]), clat, clon)[0]
    assert d < 300.0  # within level-15 cell extent


@settings(max_examples=150, deadline=None)
@given(
    st.floats(min_value=-60, max_value=60, allow_nan=False),
    lon_st,
    st.floats(min_value=0, max_value=2 * np.pi, allow_nan=False),
    st.floats(min_value=0, max_value=400.0, allow_nan=False),
)
def test_hex_ring_covering_property(lat, lon, ang, dist_m):
    """Any point within R ground-meters of (lat, lon) lies within the
    adaptive ring bound of the origin's cell."""
    dlat = np.cos(ang) * dist_m / 111_320.0
    dlon = np.sin(ang) * dist_m / (111_320.0 * max(np.cos(np.radians(lat)), 1e-6))
    lat2, lon2 = lat + dlat, lon + dlon
    c1 = cells.hex_cell_np(np.array([lat]), np.array([lon]), 9)
    c2 = cells.hex_cell_np(np.array([lat2]), np.array([lon2]), 9)
    k = cells.hex_rings_needed_np(400.0, 9, np.array([max(abs(lat), abs(lat2))]))[0]
    _, q1, r1 = cells.hex_cell_unpack(c1)
    _, q2, r2 = cells.hex_cell_unpack(c2)
    hexdist = max(abs(q1[0] - q2[0]), abs(r1[0] - r2[0]), abs((q1[0] + r1[0]) - (q2[0] + r2[0])))
    assert hexdist <= k


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-170, max_value=170, allow_nan=False),
            st.floats(min_value=-80, max_value=80, allow_nan=False),
        ),
        min_size=3,
        max_size=8,
    ),
    st.floats(min_value=-80, max_value=80, allow_nan=False),
    st.floats(min_value=-170, max_value=170, allow_nan=False),
)
def test_pip_wkb_roundtrip_consistency(coords, plat, plon):
    """WKB encode/decode is lossless and PIP agrees between the decoded
    ring and the original coordinate list."""
    ring = parse_wkb_polygon(wkb_polygon(coords))
    direct = np.array(coords + [coords[0]], dtype=float)
    a = point_in_ring_np(np.array([plat]), np.array([plon]), ring)[0]
    b = point_in_ring_np(np.array([plat]), np.array([plon]), direct)[0]
    assert a == b


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(st.text(min_size=1, max_size=6), st.text(max_size=8), max_size=5),
    st.dictionaries(st.text(min_size=1, max_size=6), st.text(max_size=8), max_size=5),
)
def test_tag_merge_laws_pure(new, old):
    """Pure-python replicas of the tag-merge laws (the Spark expressions
    are pinned by truth-table tests; these check the algebraic laws)."""
    # keep-existing: old wins; result keys = union
    keep = {**{k: v for k, v in new.items() if k not in old}, **old}
    assert set(keep) == set(new) | set(old)
    for k in old:
        assert keep[k] == old[k]
    # overwrite: new wins with '' -> 'none' sentinel
    sent = {k: (v if v != "" else "none") for k, v in new.items()}
    over = {**old, **sent}
    for k in new:
        assert over[k] == (new[k] if new[k] != "" else "none")
    # idempotence
    assert {**over, **sent} == over
