"""Spatial cell indexes (vectorized, pure numpy — no native geo libs).

Three index families, three jobs:

1. ``s2_cell``  — real S2 cell ids (level 15 default): unit sphere -> cube
   face -> quadratic ST projection -> 30-bit (i,j) -> Hilbert curve
   position, packed into the standard 64-bit S2CellId layout (3 face bits,
   2*level position bits, trailing 1). Implemented from the published S2
   geometry algorithm; ids are stored as signed int64 (two's-complement
   view of the uint64 id, the usual BIGINT convention). Used as a
   partition/cluster key: Hilbert locality keeps nearby images in nearby
   id ranges, which is what makes min/max file skipping work at 100 TB.

2. ``hex_cell`` — aperture-7-style hexagonal binning in axial coordinates
   on an equirectangular plane, with H3-compatible resolution sizing
   (edge_m(res) = res-0 edge / sqrt(7)^res, so res 9 ~ 174.4 m edge,
   matching H3 res 9). Hex k-rings are exact and cheap in axial coords,
   which is what the cell-ring-expansion kNN needs. NOTE: this is an
   H3-*style* index (same cell sizing, same ring semantics), not
   bit-identical to Uber H3 — the h3 library is unavailable in this
   environment and the engine never assumes H3's exact bit layout.

3. ``grid_cell`` — a plain floor(lat/h), floor(lon/w) integer grid that is
   expressible in ANSI SQL, used by the DuckDB-oracle-checked queries so
   the oracle can reproduce candidate generation exactly.

The radius-join prejoin contract for all three: ``ring(cell, k)`` must
cover every point within R meters of any point in ``cell`` when k is
chosen by ``rings_needed_*`` (a covering, not exact, set — the precise
haversine filter runs after the equi-join).

Reference analog: GO_Sync has *no* spatial index (O(N*M) nested loop,
task/CompareData.java:1016-1069); this module is the headline
algorithmic upgrade that makes the join a cell equi-join.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# S2 (real algorithm, vectorized)
# ---------------------------------------------------------------------------

_LOOKUP_BITS = 2  # build tables 2 Hilbert levels at a time (16*4 entries)
_SWAP = 1
_INVERT = 2
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT + _SWAP)
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped & inverted
)
_MAX_LEVEL = 30


def _init_lookup() -> tuple[np.ndarray, np.ndarray]:
    size = 1 << (2 * _LOOKUP_BITS + 2)
    lookup_pos = np.zeros(size, dtype=np.int64)
    lookup_ij = np.zeros(size, dtype=np.int64)

    def rec(level: int, i: int, j: int, orig: int, orient: int, pos: int) -> None:
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orient]
        for sub in range(4):
            rec(
                level,
                i + (r[sub] >> 1),
                j + (r[sub] & 1),
                orig,
                orient ^ _POS_TO_ORIENT[sub],
                pos + sub,
            )

    for orientation in range(4):
        rec(0, 0, 0, orientation, orientation, 0)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _init_lookup()


def _latlon_to_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray):
    lat = np.radians(lat_deg)
    lon = np.radians(lon_deg)
    coslat = np.cos(lat)
    return coslat * np.cos(lon), coslat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)

    u = np.empty_like(x)
    v = np.empty_like(x)
    face_uv = [
        (y, z, x),  # face 0 (+x): u=y/x  v=z/x
        (-x, z, y),  # face 1 (+y): u=-x/y v=z/y
        (-x, -y, z),  # face 2 (+z): u=-x/z v=-y/z
        (z, y, x),  # face 3 (-x): u=z/x  v=y/x
        (z, -x, y),  # face 4 (-y): u=z/y  v=-x/y
        (-y, -x, z),  # face 5 (-z): u=-y/z v=-x/z
    ]
    for f, (unum, vnum, den) in enumerate(face_uv):
        m = face == f
        if m.any():
            u[m] = unum[m] / den[m]
            v[m] = vnum[m] / den[m]
    return face, u, v


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    # quadratic projection (S2_QUADRATIC_PROJECTION). np.where evaluates
    # BOTH branches, so clip each sqrt operand at 0 (negative only in the
    # branch that's discarded) to avoid RuntimeWarning spam in bench logs.
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _uv_from_st(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    ij = np.floor(s * (1 << _MAX_LEVEL)).astype(np.int64)
    return np.clip(ij, 0, (1 << _MAX_LEVEL) - 1)


def s2_face_ij(lat_deg, lon_deg):
    """(face, i, j) at level 30 for arrays of degrees."""
    lat_deg = np.asarray(lat_deg, dtype=np.float64)
    lon_deg = np.asarray(lon_deg, dtype=np.float64)
    x, y, z = _latlon_to_xyz(lat_deg, lon_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_st_from_uv(u))
    j = _st_to_ij(_st_from_uv(v))
    return face, i, j


def s2_cell_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Pack (face, i30, j30) into S2CellId at `level` (uint64 viewed as int64)."""
    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP).astype(np.int64)
    mask = (1 << _LOOKUP_BITS) - 1
    steps = _MAX_LEVEL // _LOOKUP_BITS  # 15 steps of 2 bits
    for k in range(steps - 1, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    id_leaf = (n << np.uint64(1)) | np.uint64(1)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    return ((id_leaf & ~(lsb - np.uint64(1))) | lsb).view(np.int64)

def s2_cell_np(lat_deg, lon_deg, level: int = 15) -> np.ndarray:
    """S2 cell ids (int64 view) for arrays of lat/lon degrees."""
    face, i, j = s2_face_ij(lat_deg, lon_deg)
    return s2_cell_from_face_ij(face, i, j, level)


def s2_leaf_to_face_ij(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of the Hilbert packing (for tests): id -> (face, i, j) at level 30."""
    cid = np.asarray(cell_id).view(np.uint64)
    # strip trailing bit pattern down to leaf position: the position bits
    # above the lsb are valid; lower bits are the center of the cell.
    face = (cid >> np.uint64(61)).astype(np.int64)
    pos = ((cid & np.uint64((1 << 61) - 1)) >> np.uint64(1)).astype(np.int64)
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    bits = face & _SWAP
    steps = _MAX_LEVEL // _LOOKUP_BITS
    for k in range(steps - 1, -1, -1):
        nbits = _LOOKUP_BITS
        bits += ((pos >> (k * 2 * _LOOKUP_BITS)) & ((1 << (2 * nbits)) - 1)) << 2
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


def s2_cell_center_latlon(cell_id, level: int = 15):
    """Approximate center lat/lon of cells (for tests/locality checks)."""
    face, i, j = s2_leaf_to_face_ij(cell_id)
    # snap to cell center at `level`
    size = 1 << (_MAX_LEVEL - level)
    i = (i & ~(size - 1)) + size // 2
    j = (j & ~(size - 1)) + size // 2
    s = (i.astype(np.float64) + 0.5) / (1 << _MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << _MAX_LEVEL)
    u = _uv_from_st(s)
    v = _uv_from_st(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    # inverse of the face table above: face -> xyz from (u, v, 1) on that face
    tbl = {
        0: lambda u, v: (np.ones_like(u), u, v),
        1: lambda u, v: (-u, np.ones_like(u), v),
        2: lambda u, v: (-u, -v, np.ones_like(u)),
        3: lambda u, v: (-np.ones_like(u), -v, -u),
        4: lambda u, v: (v, -np.ones_like(u), -u),
        5: lambda u, v: (v, u, -np.ones_like(u)),
    }
    for f, fn in tbl.items():
        m = face == f
        if m.any():
            xx, yy, zz = fn(u[m], v[m])
            x[m], y[m], z[m] = xx, yy, zz
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / norm))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def make_s2_cell_udf(level: int = 15):
    @F.pandas_udf(T.LongType())
    def s2_cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = s2_cell_np(lat.to_numpy(np.float64), lon.to_numpy(np.float64), level)
        return pd.Series(out)

    return s2_cell


# ---------------------------------------------------------------------------
# Hex index (H3-style sizing, axial coordinates, exact k-rings)
# ---------------------------------------------------------------------------

EARTH_RADIUS_M = 6371008.8
_HEX_RES0_EDGE_M = 1107712.591  # H3 res-0 mean edge; edge(res) = this / sqrt(7)^res
_HEX_OFF = 1 << 27  # axial coordinate offset so packed coords are non-negative


def hex_edge_m(res: int) -> float:
    return _HEX_RES0_EDGE_M / (7.0 ** (res / 2.0))


def _hex_axial(lat_deg: np.ndarray, lon_deg: np.ndarray, res: int):
    """Pointy-top axial hex coords on the equirectangular plane (meters)."""
    size = hex_edge_m(res)
    x = np.radians(np.asarray(lon_deg, dtype=np.float64)) * EARTH_RADIUS_M
    y = np.radians(np.asarray(lat_deg, dtype=np.float64)) * EARTH_RADIUS_M
    qf = (math.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    # cube rounding
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_cell_np(lat_deg, lon_deg, res: int = 9) -> np.ndarray:
    """Packed hex cell id: (res << 58) | (q+OFF) << 29 | (r+OFF)."""
    q, r = _hex_axial(lat_deg, lon_deg, res)
    return (np.int64(res) << np.int64(58)) | ((q + _HEX_OFF) << np.int64(29)) | (r + _HEX_OFF)


def hex_cell_unpack(cell_id):
    cid = np.asarray(cell_id, dtype=np.int64)
    res = (cid >> np.int64(58)).astype(np.int64)
    q = ((cid >> np.int64(29)) & np.int64((1 << 29) - 1)) - _HEX_OFF
    r = (cid & np.int64((1 << 29) - 1)) - _HEX_OFF
    return res, q, r


def hex_cell_center_latlon(cell_id):
    res, q, r = hex_cell_unpack(cell_id)
    size = _HEX_RES0_EDGE_M / np.power(7.0, res / 2.0)
    x = size * (math.sqrt(3.0) * q.astype(np.float64) + math.sqrt(3.0) / 2.0 * r)
    y = size * (1.5 * r.astype(np.float64))
    return np.degrees(y / EARTH_RADIUS_M), np.degrees(x / EARTH_RADIUS_M)


def make_hex_cell_udf(res: int = 9):
    @F.pandas_udf(T.LongType())
    def hex_cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(hex_cell_np(lat.to_numpy(np.float64), lon.to_numpy(np.float64), res))

    return hex_cell


def hex_parent_np(cell_id) -> np.ndarray:
    """Aperture-7 pyramid parent: the res-1 cell containing this cell's
    CENTER (H3's parent relation is also center-containment, modulo its
    rotation scheme). Deterministic, exactly one parent per cell, and a
    uniform field yields ~7 children per parent (the aperture) — so
    pyramid rollup groups are geometry-bounded. Vectorized for per-row
    res (the axial math broadcasts over an array edge size).

    Raises on res-0 input: a res-0 cell has no parent, and silently
    packing pres=-1 into the top bits would return a garbage id."""
    res, _q, _r = hex_cell_unpack(cell_id)
    if np.any(res < 1):
        raise ValueError("hex_parent_np: res-0 cells have no parent")
    lat, lon = hex_cell_center_latlon(cell_id)
    pres = (res - np.int64(1)).astype(np.int64)
    pq, pr = _hex_axial(lat, lon, pres)
    return (pres << np.int64(58)) | ((pq + _HEX_OFF) << np.int64(29)) | (pr + _HEX_OFF)


def make_hex_parent_udf():
    @F.pandas_udf(T.LongType())
    def hex_parent(cell: pd.Series) -> pd.Series:
        return pd.Series(hex_parent_np(cell.to_numpy(np.int64)))

    return hex_parent


def make_hex_ring_udf(k: int = 1):
    """Pandas UDF: cell id -> array of all cell ids within hex distance k
    (the filled k-ring / grid_disk, (k+1)*3*k + 1 cells). Explode after."""

    offsets = [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
    ]
    dqs = np.array([o[0] for o in offsets], dtype=np.int64)
    drs = np.array([o[1] for o in offsets], dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def hex_ring(cell: pd.Series) -> pd.Series:
        cid = cell.to_numpy(np.int64)
        res, q, r = hex_cell_unpack(cid)
        # broadcast: (n, m) neighbor coords
        qn = q[:, None] + dqs[None, :]
        rn = r[:, None] + drs[None, :]
        packed = (res[:, None] << np.int64(58)) | ((qn + _HEX_OFF) << np.int64(29)) | (rn + _HEX_OFF)
        return pd.Series(list(packed))

    return hex_ring


def hex_rings_needed_np(radius_m: float, res: int, abs_lat_deg: np.ndarray) -> np.ndarray:
    """Vectorized per-row covering ring count (same bound as
    hex_rings_needed)."""
    edge = hex_edge_m(res)
    coslat = np.maximum(np.cos(np.radians(np.abs(abs_lat_deg))), 1e-6)
    plane_r = radius_m / coslat
    return np.maximum(np.ceil((plane_r + 2.0 * edge) / (1.5 * edge)).astype(np.int64), 1)


def make_hex_ring_adaptive_udf(radius_m: float, res: int = 9, k_cap: int = 16):
    """Pandas UDF: (cell, lat) -> covering cell array with PER-ROW ring
    size from the row's latitude — features near the equator explode to
    k=3 (37 cells) instead of the global worst case (k=5, 91 cells at
    |lat| 60). The output is exactly the cells a correct covering needs,
    nothing more. k_cap guards polar inputs (|lat| -> 90 makes the
    equirectangular bound blow up; cap and accept over-coverage loss
    there — the synthetic worlds stay under |lat| 62)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def hex_ring_adaptive(cell: pd.Series, lat: pd.Series) -> pd.Series:
        cid = cell.to_numpy(np.int64)
        ks = np.minimum(
            hex_rings_needed_np(radius_m, res, lat.to_numpy(np.float64)), k_cap
        )
        resv, q, r = hex_cell_unpack(cid)
        kmax = int(ks.max()) if len(ks) else 1
        # offsets for the max ring once; bucket rows by their distinct k
        # (a handful of values per batch) and expand each bucket as ONE
        # 2-D broadcast — no per-row Python loop.
        offs = [
            (dq, dr)
            for dq in range(-kmax, kmax + 1)
            for dr in range(max(-kmax, -dq - kmax), min(kmax, -dq + kmax) + 1)
        ]
        dqs = np.array([o[0] for o in offs], dtype=np.int64)
        drs = np.array([o[1] for o in offs], dtype=np.int64)
        hexdist = np.maximum(
            np.maximum(np.abs(dqs), np.abs(drs)), np.abs(dqs + drs)
        )
        out = np.empty(len(cid), dtype=object)
        for k in np.unique(ks):
            rows = np.nonzero(ks == k)[0]
            m = hexdist <= k
            dq_k, dr_k = dqs[m], drs[m]
            qn = q[rows][:, None] + dq_k[None, :]
            rn = r[rows][:, None] + dr_k[None, :]
            cells2d = (
                (resv[rows][:, None].astype(np.int64) << np.int64(58))
                | ((qn + _HEX_OFF) << np.int64(29))
                | (rn + _HEX_OFF)
            )
            out[rows] = list(cells2d)
        return pd.Series(list(out))

    return hex_ring_adaptive


def hex_rings_needed(radius_m: float, res: int, max_abs_lat_deg: float = 0.0) -> int:
    """Smallest k such that the filled k-ring is a *covering* for
    `radius_m` ground meters.

    Geometry: hex centers at hex-distance d are >= 1.5*d*edge apart in the
    plane (the lattice minimum, attained along the staggered direction),
    and any point lies within one circumradius (= edge) of its cell
    center, so two points at plane distance Dp sit in cells with
    hexdist <= (Dp + 2*edge) / (1.5*edge). Ground-to-plane: longitude
    distances stretch by 1/cos(lat) on the equirectangular plane.
    """
    edge = hex_edge_m(res)
    coslat = max(math.cos(math.radians(max_abs_lat_deg)), 1e-6)
    plane_r = radius_m / coslat
    return max(int(math.ceil((plane_r + 2.0 * edge) / (1.5 * edge))), 1)


# ---------------------------------------------------------------------------
# SQL-expressible lat/lon grid (for DuckDB-oracle queries)
# ---------------------------------------------------------------------------


def grid_cell_col(lat, lon, cell_deg: float) -> "F.Column":
    """floor-grid cell key as a Column; same formula as grid_cell_sql."""
    return (F.floor(lat / F.lit(cell_deg)) * F.lit(400000) + F.floor(lon / F.lit(cell_deg))).cast(
        "long"
    )


def grid_cell_sql(lat: str, lon: str, cell_deg: float) -> str:
    return f"(CAST(floor(({lat}) / {cell_deg!r}) AS BIGINT) * 400000 + CAST(floor(({lon}) / {cell_deg!r}) AS BIGINT))"


# ---------------------------------------------------------------------------
# JVM-only radius-covering grid (r7): candidate generation for radius
# joins without the Python hex-ring boundary
# ---------------------------------------------------------------------------
#
# The hex k-ring UDF above is geometry-faithful but pays two scale costs
# in a radius-join prejoin: an Arrow round-trip per exploded side, and a
# ring of 37-91 cells per row at res 9 for a 400 m radius. A plain
# floor grid whose cell height equals the radius needs only 3 lat-rows,
# and an ADAPTIVE number of lon-columns derived from the row's latitude
# (3 below |lat| 47, 5 at 60, growing toward the poles where meridians
# converge) — all computable as codegen'd Column arithmetic. Covering
# argument (for the set {pairs: haversine < radius_m}):
#   - d >= R*|dlat| so |dlat| < deg(r/R) < GLAT (GLAT has a 5% margin)
#     => lat row indices differ by at most 1;
#   - d >= 2R*asin(sqrt(cos(lat1)cos(lat2))*|sin(dlon/2)|) and
#     |lat_other| <= |lat_row| + GLAT give
#     |dlon| <= 2*deg(asin(sin(r/2R)/cos(|lat|+GLAT))) = B
#     => lon col indices differ by at most floor(B/GLAT)+1 = k.
#   When the asin argument reaches 1 (polar rows) B degenerates to 360
#   and the row covers the whole lon range — correct, never wrong, and
#   only hit within ~GLAT of a pole.
# The exact distance predicate downstream remains the only filter that
# decides membership; the grid only proposes candidates.
# Known limit (shared with the hex grid it replaces and the synthetic /
# fixture data ranges): longitude does not wrap at the antimeridian —
# a pair straddling +/-180 deg is not co-bucketed.

_COVER_STRIDE = 1 << 21  # lon-index packing stride (|lonidx| < 2^20 for any radius >= 70 m)


def cover_grid_deg(radius_m: float) -> float:
    """Cell size (degrees of latitude) for cover_cell_col/cover_cells_col.

    radius_m must be >= 70 m: below that the lon index range would
    overflow the _COVER_STRIDE packing and lat/lon cells could collide
    silently. Every engine radius (400 m compare/assign, 20 km driver
    queries) is far above the floor; the guard makes a future misuse
    fail loudly instead of corrupting the candidate set."""
    if radius_m < 70.0:
        raise ValueError(
            f"cover grid requires radius_m >= 70 (got {radius_m!r}); "
            "the lon-index packing would overflow"
        )
    return math.degrees(radius_m / 6371008.8) * 1.05


def cover_cell_col(lat, lon, radius_m: float) -> "F.Column":
    """Exact covering-grid cell of a point (the probe/stream side)."""
    g = cover_grid_deg(radius_m)
    return (
        F.floor(lat / F.lit(g)) * F.lit(_COVER_STRIDE) + F.floor(lon / F.lit(g))
    ).cast("long")


def cover_cells_col(lat, lon, radius_m: float) -> "F.Column":
    """Array of every covering-grid cell whose points can lie within
    radius_m (haversine) of this point (the exploded/build side)."""
    g = cover_grid_deg(radius_m)
    base = cover_cell_col(lat, lon, radius_m)
    # B = conservative |dlon| bound in degrees for a partner point; the
    # asin argument is clamped: >= 1 (near-polar) degenerates to the
    # whole lon range.
    sin_half = math.sin(radius_m / (2.0 * 6371008.8))
    arg = F.lit(sin_half) / F.cos(
        F.radians(F.least(F.abs(lat) + F.lit(g), F.lit(89.9999)))
    )
    b_deg = F.when(
        arg < 1.0, F.degrees(F.asin(arg)) * F.lit(2.0)
    ).otherwise(F.lit(360.0))
    k = F.least(
        (F.floor(b_deg / F.lit(g)) + F.lit(1)),
        F.lit(int(180.0 / g) + 1),
    ).cast("int")
    row = F.sequence(-k, k)
    return F.flatten(
        F.transform(
            row,
            lambda o: F.array(
                base - F.lit(_COVER_STRIDE) + o.cast("long"),
                base + o.cast("long"),
                base + F.lit(_COVER_STRIDE) + o.cast("long"),
            ),
        )
    )
