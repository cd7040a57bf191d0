"""Driver-gate query registry: Spark query + DuckDB oracle SQL pairs.

Each registered query runs over the driver's TPC-H-ish parquet tables and
re-expresses one or more operators from SURVEY.md §2 (reference file:line
cited per query). The Spark side uses the engine's idiomatic plan (cell
prejoins, broadcast dims, windows); the oracle side is plain ANSI SQL that
DuckDB evaluates independently — for spatial queries the oracle is the
brute-force O(N*M) formulation (exactly the reference's nested-loop
semantics, CompareData.java:1016-1069), so the comparison also proves the
cell prejoin is a correct covering.

Portability rules used throughout (Spark SQL vs DuckDB must hash-match):
- coordinates are synthesized from integer keys with pure integer
  arithmetic + one division (bit-identical IEEE in both engines);
- every float output is rounded (>= 1 decimal place below any plausible
  cross-libm ulp divergence);
- integer aggregates are cast to BIGINT explicitly (DuckDB sum(int) is
  HUGEINT otherwise);
- all columns aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .functions.geo import haversine_m_col, haversine_sql
from .functions.cells import grid_cell_col, grid_cell_sql

# ---------------------------------------------------------------------------
# registry plumbing
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names]


# ---------------------------------------------------------------------------
# synthetic coordinates (portable Spark <-> DuckDB)
# ---------------------------------------------------------------------------
# key -> lat in [-60, 60), lon in [-170, 170); 16 coarse clusters to create
# realistic spatial skew (urban clustering), mirroring how the engine's
# synth geotags images from phash (phash_latlon).

# lat in [-58, 51), lon in [-160, 128): 16 cluster bases 7 deg / 19 deg
# apart, ~2 deg x 3 deg jitter inside each cluster (spatial skew by design).
# CAST(... AS DOUBLE) matters: Spark would otherwise treat the `/ 600000.0`
# literal as DECIMAL and truncate the division to 8 fractional digits,
# while DuckDB computes in DOUBLE — the cast pins both to IEEE doubles.
_LAT_EXPR = (
    "(CAST(-58.0 AS DOUBLE) + (({k} % 16) * 7) "
    "+ CAST(({k} * 2654435761) % 1200000 AS DOUBLE) / 600000.0)"
)
_LON_EXPR = (
    "(CAST(-160.0 AS DOUBLE) + (({k} % 16) * 19) "
    "+ CAST(({k} * 40503) % 3000000 AS DOUBLE) / 1000000.0)"
)


def synth_lat_sql(key: str) -> str:
    return _LAT_EXPR.format(k=key)


def synth_lon_sql(key: str) -> str:
    return _LON_EXPR.format(k=key)


def with_synth_coords(df: DataFrame, key: str, lat: str = "lat", lon: str = "lon") -> DataFrame:
    return df.withColumn(lat, F.expr(synth_lat_sql(key))).withColumn(
        lon, F.expr(synth_lon_sql(key))
    )


# Covering proof: grid cell is 0.5 deg; ground width of one lon cell at the
# max |lat|=60 of the synth coords is 55.6 km * cos(60) = 27.8 km > RADIUS_M,
# and one lat cell is 55.6 km > RADIUS_M, so the 3x3 neighborhood covers the
# 20 km radius everywhere in the data's range.
GRID_DEG = 0.5
RADIUS_M = 20_000.0


def _grid_ring_join(
    left: DataFrame, right: DataFrame, radius_m: float = RADIUS_M
) -> DataFrame:
    """Cell-prejoined radius join (the engine pattern, J1 analog).

    left gets its exact grid cell; right is exploded to the 3x3 cell
    neighborhood so every pair within one cell width is co-bucketed, then
    the exact haversine predicate filters. Catalyst broadcasts the small
    exploded side; at 100 TB the same plan shuffles on `cell` with AQE
    skew splitting.
    """
    lcell = left.withColumn("cell", grid_cell_col(F.col("lat"), F.col("lon"), GRID_DEG))
    offs = F.expr(
        "explode(array(-400001,-400000,-399999,-1,0,1,399999,400000,400001))"
    )
    rcell = (
        right.withColumn("base_cell", grid_cell_col(F.col("lat"), F.col("lon"), GRID_DEG))
        .withColumn("off", offs)
        .withColumn("cell", F.col("base_cell") + F.col("off"))
        .drop("base_cell", "off")
    )
    r = rcell.select(
        F.col("cell"),
        F.col("lat").alias("r_lat"),
        F.col("lon").alias("r_lon"),
        *[F.col(c) for c in rcell.columns if c not in ("cell", "lat", "lon")],
    )
    joined = lcell.join(F.broadcast(r), "cell").withColumn(
        "dist_m", haversine_m_col(F.col("lat"), F.col("lon"), F.col("r_lat"), F.col("r_lon"))
    )
    return joined


# ---------------------------------------------------------------------------
# A. relational core (TPC-H-ish): aggregations, joins, windows, set ops
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf_dir):
    """TPC-H Q1-style scan+agg (SURVEY §2.4 A-group; pushdown showcase)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q02_topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rn, round(o_totalprice, 2) AS totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q02(spark, sf_dir):
    """Top-k per group window — the kNN ranking pattern (J4, CompareData.java:73-82)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            "rn",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


@register(
    "q03_revenue_by_nation",
    """
    SELECT n_name, r_name,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def q03(spark, sf_dir):
    """Multi-way equi-join with broadcast dimensions (J-group; star join)."""
    orders, customer, nation, region = load(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "q04_customers_without_orders",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q04(spark, sf_dir):
    """Anti-join — 'new stops to upload' (J5, CompareData.java:1272-1287)."""
    customer, orders = load(spark, sf_dir, "customer", "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "q05_segment_order_activity",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_active
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def q05(spark, sf_dir):
    """Semi-join (intersection marking, CompareData.java:815-818)."""
    customer, orders = load(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "q06_set_ops",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def q06(spark, sf_dir):
    """Set ops union/except (SURVEY §2.7; reviseUpload CompareData.java:410-439)."""
    (customer,) = load(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    c = customer.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return a.union(b).distinct().exceptAll(c.distinct())


@register(
    "q07_refs_per_supplier",
    """
    SELECT l_suppkey,
           array_to_string(array_agg(DISTINCT l_returnflag ORDER BY l_returnflag), ';')
             AS flag_refs,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q07(spark, sf_dir):
    """Grouped distinct-set + sorted ';'-join — route_ref string agg
    (A3/A8, GTFSReadIn.java:531-562,633-646; lexical order per SURVEY §4)."""
    (li,) = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.concat_ws(";", F.sort_array(F.collect_set("l_returnflag"))).alias("flag_refs"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "q08_variant_dedup",
    """
    WITH seqs AS (
      SELECT l_orderkey,
             md5(string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_linenumber))
               AS variant_sig
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT variant_sig,
           CAST(min(l_orderkey) AS BIGINT) AS variant_id,
           CAST(count(*) AS BIGINT) AS n_trips
    FROM seqs GROUP BY variant_sig HAVING count(*) > 1
    """,
)
def q08(spark, sf_dir):
    """RouteVariant dedup: identical ordered item sequences collapse
    (A4/A5, GTFSReadIn.java:384-407,434-464; RouteVariant.java:123-126)."""
    (li,) = load(spark, sf_dir, "lineitem")
    seqs = (
        li.groupBy("l_orderkey")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("l_linenumber", "l_partkey"))
                        ),
                        lambda x: x["l_partkey"].cast("string"),
                    ),
                )
            ).alias("variant_sig")
        )
    )
    return (
        seqs.groupBy("variant_sig")
        .agg(
            F.min("l_orderkey").alias("variant_id"),
            F.count("*").alias("n_trips"),
        )
        .filter(F.col("n_trips") > 1)
    )


# ---------------------------------------------------------------------------
# B. spatial core: radius join, kNN, categorization, bbox
# ---------------------------------------------------------------------------


def _cust_coords(spark, sf_dir):
    (customer,) = load(spark, sf_dir, "customer")
    return with_synth_coords(customer.select("c_custkey"), "c_custkey")


def _supp_coords(spark, sf_dir):
    (supplier,) = load(spark, sf_dir, "supplier")
    return with_synth_coords(supplier.select("s_suppkey"), "s_suppkey")


_CUST_SQL = f"""customer_geo AS (
  SELECT c_custkey, {synth_lat_sql('c_custkey')} AS lat, {synth_lon_sql('c_custkey')} AS lon
  FROM customer
)"""
_SUPP_SQL = f"""supplier_geo AS (
  SELECT s_suppkey, {synth_lat_sql('s_suppkey')} AS lat, {synth_lon_sql('s_suppkey')} AS lon
  FROM supplier
)"""
_DIST_SQL = haversine_sql("c.lat", "c.lon", "s.lat", "s.lon")


@register(
    "q09_radius_join",
    f"""
    WITH {_CUST_SQL}, {_SUPP_SQL}
    SELECT c.c_custkey, s.s_suppkey, round({_DIST_SQL}, 1) AS dist_m
    FROM customer_geo c CROSS JOIN supplier_geo s
    WHERE {_DIST_SQL} < {RADIUS_M!r}
    """,
)
def q09(spark, sf_dir):
    """Radius distance join via grid-cell prejoin (J1; replaces the
    reference's O(N*M) loop CompareData.java:1016-1069). The DuckDB oracle
    IS the O(N*M) loop, so equality proves covering correctness."""
    cust = _cust_coords(spark, sf_dir)
    supp = _supp_coords(spark, sf_dir)
    j = _grid_ring_join(cust, supp)
    return j.filter(F.col("dist_m") < RADIUS_M).select(
        "c_custkey", "s_suppkey", F.round("dist_m", 1).alias("dist_m")
    )


@register(
    "q10_knn",
    f"""
    WITH {_CUST_SQL}, {_SUPP_SQL}, pairs AS (
      SELECT c.c_custkey, s.s_suppkey, {_DIST_SQL} AS dist_m
      FROM customer_geo c CROSS JOIN supplier_geo s
      WHERE {_DIST_SQL} < {RADIUS_M!r}
    )
    SELECT c_custkey, s_suppkey, rank_k, round(dist_m, 1) AS dist_m FROM (
      SELECT c_custkey, s_suppkey, dist_m,
             CAST(row_number() OVER (PARTITION BY c_custkey
                            ORDER BY dist_m, s_suppkey) AS INT) AS rank_k
      FROM pairs
    ) WHERE rank_k <= 5
    """,
)
def q10(spark, sf_dir):
    """Radius-bounded kNN k=5, (dist, id) tie-break — the match report
    (J4, CompareData.java:73-82,272-312; north_rule k=5 haversine)."""
    cust = _cust_coords(spark, sf_dir)
    supp = _supp_coords(spark, sf_dir)
    j = _grid_ring_join(cust, supp).filter(F.col("dist_m") < RADIUS_M)
    w = W.partitionBy("c_custkey").orderBy(F.asc("dist_m"), F.asc("s_suppkey"))
    return (
        j.withColumn("rank_k", F.row_number().over(w))
        .filter(F.col("rank_k") <= 5)
        .select("c_custkey", "s_suppkey", "rank_k", F.round("dist_m", 1).alias("dist_m"))
    )


# categorization: give each supplier a synthetic "gtfs_id" = s_suppkey*13%1500
# so some customers have an id-matched feature nearby. Reference rule
# (CompareData.java:1059-1287): id match within range -> MODIFY (moved,
# >500m here) or NOTHING_NEW (<=500m); no id match but neighbor within
# range -> UPLOAD_CONFLICT; no neighbor -> UPLOAD_NO_CONFLICT.
_ID_MATCH_SQL = "(s.s_suppkey * 13) % 1500 = c.c_custkey % 1500"


@register(
    "q11_match_categories",
    f"""
    WITH {_CUST_SQL}, {_SUPP_SQL}, pairs AS (
      SELECT c.c_custkey, s.s_suppkey, {_DIST_SQL} AS dist_m,
             CASE WHEN {_ID_MATCH_SQL} THEN 1 ELSE 0 END AS id_match
      FROM customer_geo c CROSS JOIN supplier_geo s
      WHERE {_DIST_SQL} < {RADIUS_M!r}
    ), best AS (
      SELECT c_custkey, dist_m, id_match,
             row_number() OVER (PARTITION BY c_custkey
                 ORDER BY id_match DESC, dist_m, s_suppkey) AS rn
      FROM pairs
    ), cat AS (
      SELECT c.c_custkey,
             CASE
               WHEN b.c_custkey IS NULL THEN 'UPLOAD_NO_CONFLICT'
               WHEN b.id_match = 1 AND b.dist_m <= 500.0 THEN 'NOTHING_NEW'
               WHEN b.id_match = 1 THEN 'MODIFY'
               ELSE 'UPLOAD_CONFLICT'
             END AS category
      FROM customer_geo c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        ON c.c_custkey = b.c_custkey
    )
    SELECT category, CAST(count(*) AS BIGINT) AS n FROM cat GROUP BY category
    """,
)
def q11(spark, sf_dir):
    """Four-way match categorization (J2/J3/J5/J6,
    CompareData.java:1059-1287): one category column, not four mutable sets."""
    cust = _cust_coords(spark, sf_dir)
    supp = _supp_coords(spark, sf_dir)
    pairs = _grid_ring_join(cust, supp).filter(F.col("dist_m") < RADIUS_M)
    pairs = pairs.withColumn(
        "id_match",
        F.when((F.col("s_suppkey") * 13) % 1500 == F.col("c_custkey") % 1500, 1).otherwise(0),
    )
    w = W.partitionBy("c_custkey").orderBy(
        F.desc("id_match"), F.asc("dist_m"), F.asc("s_suppkey")
    )
    best = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    cat = cust.join(
        best.select("c_custkey", "id_match", "dist_m"), "c_custkey", "left"
    ).withColumn(
        "category",
        F.when(F.col("id_match").isNull(), "UPLOAD_NO_CONFLICT")
        .when((F.col("id_match") == 1) & (F.col("dist_m") <= 500.0), "NOTHING_NEW")
        .when(F.col("id_match") == 1, "MODIFY")
        .otherwise("UPLOAD_CONFLICT"),
    )
    return cat.groupBy("category").agg(F.count("*").alias("n"))


@register(
    "q12_bbox",
    f"""
    WITH {_CUST_SQL}
    SELECT round(min(lat) - 0.004, 6) AS min_lat, round(max(lat) + 0.004, 6) AS max_lat,
           round(min(lon) - 0.004, 6) AS min_lon, round(max(lon) + 0.004, 6) AS max_lon
    FROM customer_geo
    """,
)
def q12(spark, sf_dir):
    """Padded bounding-box aggregation (A1, CompareData.java:202-261,
    DELTA=0.004 deg CompareData.java:128)."""
    cust = _cust_coords(spark, sf_dir)
    return cust.agg(
        F.round(F.min("lat") - 0.004, 6).alias("min_lat"),
        F.round(F.max("lat") + 0.004, 6).alias("max_lat"),
        F.round(F.min("lon") - 0.004, 6).alias("min_lon"),
        F.round(F.max("lon") + 0.004, 6).alias("max_lon"),
    )
