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

from ..functions.cells import hex_cell_np, hex_cell_unpack, _HEX_OFF


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
    for _, r in poly_pdf.iterrows():
        c_lo = hex_cell_np(np.array([r.min_lat]), np.array([r.min_lon]), res)[0]
        c_hi = hex_cell_np(np.array([r.max_lat]), np.array([r.max_lon]), res)[0]
        _, q0, r0 = hex_cell_unpack(np.array([c_lo]))
        _, q1, r1 = hex_cell_unpack(np.array([c_hi]))
        qs = range(int(min(q0[0], q1[0])) - 1, int(max(q0[0], q1[0])) + 2)
        rs = range(int(min(r0[0], r1[0])) - 1, int(max(r0[0], r1[0])) + 2)
        n = len(qs) * len(rs)
        if n > max_cells:
            rows.append((r.poly_id, None))
            continue
        for q in qs:
            for rr in rs:
                cell = (res << 58) | ((q + _HEX_OFF) << 29) | (rr + _HEX_OFF)
                rows.append((r.poly_id, int(cell)))
    return pd.DataFrame(rows, columns=["poly_id", "hex_cell"])


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "image_id",
) -> DataFrame:
    """All (point, polygon) pairs where the point lies inside the polygon.

    Plan: bbox candidate filter (range predicates on the broadcast polygon
    side -> BroadcastNestedLoopJoin over tiny dims; with polygon_cells it
    becomes a hash join) then the exact ray-cast pandas UDF on survivors.
    """
    polys = F.broadcast(
        polygons.select(
            "poly_id", "wkb", "min_lat", "max_lat", "min_lon", "max_lon"
        )
    )
    cand = points.select(id_col, lat_col, lon_col).join(
        polys,
        (F.col(lat_col) >= F.col("min_lat"))
        & (F.col(lat_col) <= F.col("max_lat"))
        & (F.col(lon_col) >= F.col("min_lon"))
        & (F.col(lon_col) <= F.col("max_lon")),
    )

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
