"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on /root/testdata/sf0.001.
queries()     -> named (spark, sf_dir) -> DataFrame callables, one per
                 implemented operator group from SURVEY.md §2.
oracle_sql()  -> matching DuckDB ANSI-SQL oracles.

All real logic lives in gtfs_osm_sync_spark/; this module is the thin
driver-facing surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gtfs_osm_sync_spark import driver_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: radius-bounded kNN spatial join (J1+J4) on sf0.001.

    The engine's headline pipeline — cell-prejoined candidate generation,
    broadcast small side, haversine filter, windowed kNN rank — in the
    shape the reference's compareBusStopData computes with an O(N*M) loop
    (task/CompareData.java:1000-1290).
    """
    return dq.QUERIES["q10_knn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(dq.ORACLES)
