"""The flagship operator set: cell-prejoined radius join, ring-expansion
kNN, and four-way match categorization.

This is the Spark-first re-expression of the reference's
compareBusStopData (task/CompareData.java:1000-1290), which is an O(N*M)
nested Vincenty loop over parallelStream. Here:

  images --phash_latlon--> lat/lon --hex_cell--> cell
  features --hex_cell + k-ring explode--> candidate cells
  equi-join on cell  (broadcast small side / shuffle+AQE-skew big side)
  haversine filter < radius  (JVM codegen, no Python)
  row_number() over (partition by image order by dist, id) <= k

Scale notes (the part that matters at 100 TB):
- Candidate generation multiplies the SMALL side (features) by the ring
  size, never the big side. With a broadcastable feature set the big
  side is a single map-only stage: scan -> pandas_udf(cell) -> hash
  lookup -> filter -> local top-k, no shuffle of the images at all
  except the final window (which AQE coalesces per cell group).
- When features don't fit a broadcast, both sides shuffle on `cell`;
  dense urban cells are the skew risk, handled by (a) AQE skew-join
  splitting and (b) explicit salting (salt_dense_cells below): the big
  side salts cell -> (cell, salt), the small side explodes to all salts.
- kNN ring expansion: k=1 ring covers the 400 m radius at res 9
  (rings_needed computes this from the geometry; at high |lat| it grows).
  The guarantee is covering, not exactness — the haversine filter is the
  precise predicate (same contract as the reference's RANGE check).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.cells import (
    cover_cell_col,
    cover_cells_col,
    make_hex_cell_udf,
    make_hex_ring_adaptive_udf,
    make_s2_cell_udf,
)
from ..functions.geo import EARTH_RADIUS_M, haversine_m_col
from ..synth import make_phash_latlon_udf

DEFAULT_RADIUS_M = 400.0  # reference RANGE, CompareData.java:129
ERROR_TO_ZERO_M = 0.5  # reference ERROR_TO_ZERO, CompareData.java:127
DEFAULT_K = 5  # north_rule kNN k
HEX_RES = 9


def geotag_images(images: DataFrame) -> DataFrame:
    """images + (lat, lon, hex_cell, s2_cell) derived columns.

    One map-only stage and ONE fused Arrow round-trip: a single pandas UDF
    computes geotag + both cell ids per batch (three separate UDFs would
    triple the Python worker serde for the same numbers).
    """
    from ..functions.cells import hex_cell_np, s2_cell_np
    from ..synth import phash_latlon_np

    @F.pandas_udf("lat double, lon double, hex_cell long, s2_cell long")
    def geotag(phash: pd.Series) -> pd.DataFrame:
        ph = phash.to_numpy(np.int64)
        lat, lon = phash_latlon_np(ph)
        return pd.DataFrame(
            {
                "lat": lat,
                "lon": lon,
                "hex_cell": hex_cell_np(lat, lon, HEX_RES),
                "s2_cell": s2_cell_np(lat, lon, 15),
            }
        )

    out = images.withColumn("_g", geotag(F.col("phash")))
    return out.select("*", "_g.lat", "_g.lon", "_g.hex_cell", "_g.s2_cell").drop("_g")


def features_with_ring_cells(
    features: DataFrame, radius_m: float = DEFAULT_RADIUS_M
) -> DataFrame:
    """Explode features to every hex cell whose points could be within
    radius_m: cell(feature) + filled k-ring, with the ring size computed
    PER FEATURE from its latitude (equator k=3 / 37 cells vs the |lat|=60
    worst case k=5 / 91 cells — a ~2x cut in candidate rows)."""
    hexc = make_hex_cell_udf(HEX_RES)
    ring = make_hex_ring_adaptive_udf(radius_m, HEX_RES)
    return (
        features.withColumn("_c", hexc("lat", "lon"))
        .withColumn("hex_cell", F.explode(ring(F.col("_c"), F.col("lat"))))
        .drop("_c")
    )


def radius_join(
    images_geo: DataFrame,
    features: DataFrame,
    radius_m: float = DEFAULT_RADIUS_M,
    broadcast_features: bool = True,
    n_salt: int = 0,
) -> DataFrame:
    """J1: every (image, feature) pair within radius_m meters.

    images_geo must already carry (lat, lon, hex_cell) — see geotag_images.
    Returns the joined frame with `dist_m`.

    Skew handling for the shuffle path (broadcast_features=False):
    AQE skew-join splitting is on session-wide; n_salt > 1 additionally
    salts the hot-cell shuffle EXPLICITLY (north_rule): the big side gets
    salt = hash(image_id) % n_salt, the small (ring-exploded) side is
    replicated across all salts, and the equi-join key becomes
    (hex_cell, salt) — a dense urban cell spreads over n_salt tasks.
    Results are identical with/without salting (tests pin this).
    """
    # r7: candidate cells come from the JVM covering grid (cover_cells_col
    # — 9-15 cells per feature vs the hex k-ring's 37-91 at res 9, zero
    # Python, ~5x smaller broadcast); the image side computes its exact
    # cover cell as floor arithmetic instead of using the stored hex_cell
    # as the join key (hex_cell stays untouched as a data column).
    f = features.select(
        F.explode(
            cover_cells_col(F.col("lat"), F.col("lon"), radius_m)
        ).alias("_ccell"),
        F.col("feature_id"),
        F.col("lat").alias("f_lat"),
        F.col("lon").alias("f_lon"),
        F.cos(F.radians(F.col("lat"))).alias("_f_coslat"),
        *[
            c
            for c in features.columns
            if c not in ("feature_id", "lat", "lon")
        ],
    )
    keys = ["_ccell"]
    left = images_geo.withColumn(
        "_ccell", cover_cell_col(F.col("lat"), F.col("lon"), radius_m)
    ).withColumn("_i_coslat", F.cos(F.radians(F.col("lat"))))
    if broadcast_features:
        f = F.broadcast(f)
    elif n_salt and n_salt > 1:
        left = left.withColumn("_salt", F.pmod(F.xxhash64("image_id"), F.lit(n_salt)))
        f = f.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        ).withColumn("_salt", F.col("_salt").cast("long"))
        keys = ["_ccell", "_salt"]
    joined = left.join(f, keys)
    # r7 (guide §2.3/§3): conservative bbox prefilter evaluated before any
    # trig in the (pushed-down) join condition, with cos(lat) hoisted to
    # one evaluation per ROW. haversine d >= R*|dlat| gives the lat bound;
    # d >= 2R*asin(sqrt(cos(lat1)cos(lat2))*|sin(dlon/2)|) with the
    # sin(x) >= 0.9999874*x linearization (valid for |dlon| < 1 deg —
    # larger dlon skips the test via the OR guard, it never drops) gives
    # the lon bound. False keeps fall to the exact haversine below, so
    # the pair set is unchanged; dist_m is bit-identical (same expression
    # tree as haversine_m_col with the cos factors materialized).
    dlat = F.col("f_lat") - F.col("lat")
    dlon = F.col("f_lon") - F.col("lon")
    cosprod = F.col("_i_coslat") * F.col("_f_coslat")
    dlat_bound = math.degrees(radius_m / EARTH_RADIUS_M) * 1.0000001
    dlon_bound2 = (math.degrees((radius_m / EARTH_RADIUS_M) / 0.9999874) * 1.0000001) ** 2
    pre = (F.abs(dlat) < F.lit(dlat_bound)) & (
        (dlon * dlon * cosprod < F.lit(dlon_bound2)) | (F.abs(dlon) >= F.lit(1.0))
    )
    dist = F.lit(2.0 * EARTH_RADIUS_M) * F.asin(
        F.sqrt(
            F.pow(F.sin(F.radians(dlat) / 2.0), 2)
            + cosprod * F.pow(F.sin(F.radians(dlon) / 2.0), 2)
        )
    )
    out = joined.filter(pre).withColumn("dist_m", dist).filter(F.col("dist_m") < radius_m)
    return out.drop("_salt", "_i_coslat", "_f_coslat", "_ccell")


def knn_join(
    images_geo: DataFrame,
    features: DataFrame,
    k: int = DEFAULT_K,
    radius_m: float = DEFAULT_RADIUS_M,
    id_col: str = "image_id",
    broadcast_features: bool = True,
) -> DataFrame:
    """J4: radius-bounded kNN, nearest-wins with (dist, feature_id)
    tie-break (deterministic replacement for the reference's
    first-match-wins scan order — SURVEY §4 deviation note)."""
    pairs = radius_join(images_geo, features, radius_m, broadcast_features)
    w = W.partitionBy(id_col).orderBy(F.asc("dist_m"), F.asc("feature_id"))
    return pairs.withColumn("rank_k", F.row_number().over(w)).filter(
        F.col("rank_k") <= k
    )


def categorize_matches(
    images_geo: DataFrame,
    features: DataFrame,
    radius_m: float = DEFAULT_RADIUS_M,
    id_col: str = "image_id",
    gtfs_id_col: str = "gtfs_id_img",
) -> DataFrame:
    """J2+J3+J5+J6: the reference's four-way decision
    (CompareData.java:1059-1287) as one category column:

    - best candidate has matching gtfs_id, dist <= 0.5 m -> NOTHING_NEW
    - matching gtfs_id, dist > 0.5 m                     -> MODIFY
      (stop moved; reference re-locates it, CompareData.java:1071-1148)
    - candidates in range but no id match                -> UPLOAD_CONFLICT
    - nothing in range                                   -> UPLOAD_NO_CONFLICT

    Priority (id-match first, then nearest) replaces the reference's
    mutable-set precedence passes (reviseUpload/reviseNoUpload,
    CompareData.java:410-439) with one deterministic window.
    """
    pairs = radius_join(images_geo, features, radius_m).withColumn(
        "id_match",
        F.when(
            F.col("gtfs_id").isNotNull() & (F.col("gtfs_id") == F.col(gtfs_id_col)), 1
        ).otherwise(0),
    )
    w = W.partitionBy(id_col).orderBy(
        F.desc("id_match"), F.asc("dist_m"), F.asc("feature_id")
    )
    best = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "feature_id", "dist_m", "id_match")
    )
    out = images_geo.join(best, id_col, "left")
    return out.withColumn(
        "category",
        F.when(F.col("id_match").isNull(), "UPLOAD_NO_CONFLICT")
        .when((F.col("id_match") == 1) & (F.col("dist_m") <= ERROR_TO_ZERO_M), "NOTHING_NEW")
        .when(F.col("id_match") == 1, "MODIFY")
        .otherwise("UPLOAD_CONFLICT"),
    )


def salt_dense_cells(
    big: DataFrame,
    small: DataFrame,
    cell_col: str = "hex_cell",
    n_salt: int = 8,
    row_key: str = "image_id",
) -> tuple[DataFrame, DataFrame, str]:
    """Explicit skew salting (north_rule requires it alongside AQE).

    Big side: salted_cell = (cell, hash(row) % n_salt).
    Small side: exploded to all n_salt variants.
    Join on the composite key spreads a hot cell over n_salt tasks.
    Returns (big', small', join_col).
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(row_key)), F.lit(n_salt))
    ).withColumn("_salted_cell", F.concat_ws("#", F.col(cell_col), F.col("_salt")))
    salted_small = (
        small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
        .withColumn("_salted_cell", F.concat_ws("#", F.col(cell_col), F.col("_salt")))
        .drop("_salt")
    )
    return salted_big.drop("_salt"), salted_small, "_salted_cell"
