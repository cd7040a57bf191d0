"""Point-in-polygon join: vectorized ray casting over WKB polygons.

The reference has no PIP (GO_Sync only uses bbox + radius,
HttpRequest.java:121-163); this is a north_rule [custom] operator. Design:

1. candidate pruning: polygons carry their bbox (min/max lat/lon). The
   candidate join is images x polygons on bbox containment — expressed as
   a range join; at scale, polygons are exploded to their covering hex
   cells (polygon_cells below) and the join becomes a cell equi-join,
   which Catalyst executes as a hash join instead of a theta join.
2. exact test: one Arrow-batched pandas UDF running an even-odd
   ray-casting crossing count in NumPy over the (already pruned) pairs.
   Points exactly on an edge follow the half-open convention
   (y1 > y) != (y2 > y) — deterministic, side-consistent.

WKB parsing happens once per polygon batch driver-side cheaply; the hot
path ships decoded coordinate arrays, not WKB, to executors via the
broadcast polygon frame.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cells import _hex_axial, _HEX_OFF, make_hex_cell_udf


def parse_wkb_polygon(wkb: bytes) -> np.ndarray:
    """WKB polygon -> (n, 2) array of (lon, lat) outer-ring coords.

    Supports little/big endian, type 3 (Polygon); only the outer ring is
    used (v0: no holes, matching FIXTURES.md §1.3)."""
    bo = "<" if wkb[0] == 1 else ">"
    (gtype,) = struct.unpack(bo + "I", wkb[1:5])
    if gtype != 3:
        raise ValueError(f"not a WKB polygon (type {gtype})")
    (nrings,) = struct.unpack(bo + "I", wkb[5:9])
    if nrings < 1:
        return np.zeros((0, 2))
    (npts,) = struct.unpack(bo + "I", wkb[9:13])
    coords = np.frombuffer(wkb, dtype=bo + "f8", count=npts * 2, offset=13)
    return coords.reshape(npts, 2).copy()


def point_in_ring_np(lat: np.ndarray, lon: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: rays cast in +lon direction.

    ring: (n, 2) of (lon, lat), closed or open (auto-closed).
    Returns boolean array, same shape as lat/lon.
    """
    if len(ring) and (ring[0] != ring[-1]).any():
        ring = np.vstack([ring, ring[0]])
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    inside = np.zeros(x.shape, dtype=bool)
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    for e in range(len(x1)):
        cond = (y1[e] > y) != (y2[e] > y)
        if not cond.any():
            continue
        xs = (x2[e] - x1[e]) * (y - y1[e]) / (y2[e] - y1[e]) + x1[e]
        inside ^= cond & (x < xs)
    return inside


def polygon_cells(poly_pdf: pd.DataFrame, res: int = 9, max_cells: int = 200_000) -> pd.DataFrame:
    """Covering hex cells per polygon (from its bbox, padded one cell).

    Used to turn the PIP candidate join into a cell equi-join. Polygons
    whose bbox covers more than max_cells cells fall back to the bbox
    range join (flagged with cell = NULL) — the global-band polygon case.
    Returns (poly_id, hex_cell nullable).
    """
    rows: list[tuple[str, int | None]] = []
    for _, row in poly_pdf.iterrows():
        # axial q depends on BOTH lon and lat (q = (sqrt3/3*x - y/3)/size),
        # so q/r extremes must come from ALL FOUR bbox corners — the two
        # diagonal corners alone miss the (min_lat,max_lon)/(max_lat,min_lon)
        # q extremes and drop ~half the interior cells. qf/rf are linear in
        # (x, y), so over a rectangle their extremes ARE at corners; pad 2
        # for cube rounding. Over-coverage (the full q x r rectangle) only
        # adds candidates; the exact ray-cast removes them.
        lats = np.array([row.min_lat, row.min_lat, row.max_lat, row.max_lat])
        lons = np.array([row.min_lon, row.max_lon, row.min_lon, row.max_lon])
        qc, rc = _hex_axial(lats, lons, res)
        q_lo, q_hi = int(qc.min()) - 2, int(qc.max()) + 2
        r_lo, r_hi = int(rc.min()) - 2, int(rc.max()) + 2
        n = (q_hi - q_lo + 1) * (r_hi - r_lo + 1)
        if n > max_cells:
            rows.append((row.poly_id, None))
            continue
        for q in range(q_lo, q_hi + 1):
            for rr in range(r_lo, r_hi + 1):
                cell = (res << 58) | ((q + _HEX_OFF) << 29) | (rr + _HEX_OFF)
                rows.append((row.poly_id, int(cell)))
    out = pd.DataFrame(rows, columns=["poly_id", "hex_cell"])
    # a None (giant-polygon marker) must NOT upcast the int64 cell ids to
    # float64 (2^53 mantissa silently corrupts ~2.6e18 cell ids): force
    # the nullable Int64 extension dtype.
    out["hex_cell"] = pd.array([r[1] for r in rows], dtype="Int64")
    return out


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "image_id",
    res: int = 7,
    use_cells: bool = True,
    max_cells: int = 200_000,
) -> DataFrame:
    """All (point, polygon) pairs where the point lies inside the polygon.

    Plan (use_cells=True, the scale path): polygons expand to their
    covering hex cells via mapInPandas (distributed over the polygon
    side); points compute their own cell; candidates come from a
    BroadcastHashJoin on hex_cell — an equi-join Catalyst can hash,
    instead of a BroadcastNestedLoopJoin over bbox theta predicates.
    Polygons whose covering exceeds `max_cells` (continental/global bands)
    fall back to the bbox range join, disjoint by poly_id. A bbox refine
    filter after the cell join discards ring-overhang candidates cheaply
    in codegen before the exact ray-cast pandas UDF runs on survivors.
    `res` controls only the COVERING granularity (exactness comes from
    the ray cast): coarser cells = smaller cell table, more candidate
    overhang; res 7 (~1.2 km edge) suits city-scale polygon layers.

    At a 10^5-polygon layer the cell table is the only broadcast growth;
    if it outgrows broadcast the same equi-join shuffles on hex_cell —
    still a hash join, never all-pairs.
    """
    polys_cols = ["poly_id", "wkb", "min_lat", "max_lat", "min_lon", "max_lon"]
    polys = polygons.select(*polys_cols)
    bbox_pred = (
        (F.col(lat_col) >= F.col("min_lat"))
        & (F.col(lat_col) <= F.col("max_lat"))
        & (F.col(lon_col) >= F.col("min_lon"))
        & (F.col(lon_col) <= F.col("max_lon"))
    )
    pts = points.select(id_col, lat_col, lon_col)
    if use_cells:
        cell_schema = T.StructType(
            [
                T.StructField("poly_id", T.StringType()),
                T.StructField("hex_cell", T.LongType()),
            ]
        )

        def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf):
                    yield polygon_cells(pdf, res=res, max_cells=max_cells)

        pcells = polys.mapInPandas(cover, cell_schema)
        normal = pcells.filter(F.col("hex_cell").isNotNull())
        giant_ids = pcells.filter(F.col("hex_cell").isNull()).select("poly_id")

        pts_cells = pts.withColumn(
            "hex_cell", make_hex_cell_udf(res)(F.col(lat_col), F.col(lon_col))
        )
        cand_normal = (
            pts_cells.join(F.broadcast(normal), "hex_cell")
            .join(F.broadcast(polys), "poly_id")
            .filter(bbox_pred)
            .drop("hex_cell")
        )
        giants = polys.join(giant_ids, "poly_id", "left_semi")
        cand_giant = pts.join(F.broadcast(giants), bbox_pred)
        cand = cand_normal.select(id_col, lat_col, lon_col, "poly_id", "wkb").unionByName(
            cand_giant.select(id_col, lat_col, lon_col, "poly_id", "wkb")
        )
    else:
        cand = pts.join(F.broadcast(polys), bbox_pred)

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("poly_id", T.StringType()),
            T.StructField(lat_col, T.DoubleType()),
            T.StructField(lon_col, T.DoubleType()),
        ]
    )

    def test_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_cache: dict[str, np.ndarray] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            lat = pdf[lat_col].to_numpy(np.float64)
            lon = pdf[lon_col].to_numpy(np.float64)
            for pid, idx in pdf.groupby("poly_id").indices.items():
                ring = ring_cache.get(pid)
                if ring is None:
                    ring = parse_wkb_polygon(pdf["wkb"].iloc[idx[0]])
                    ring_cache[pid] = ring
                keep[idx] = point_in_ring_np(lat[idx], lon[idx], ring)
            sel = pdf.loc[keep, [id_col, "poly_id", lat_col, lon_col]]
            if len(sel):
                yield sel

    return cand.mapInPandas(test_batches, out_schema)
