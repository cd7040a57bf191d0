"""S8: NeTEx StopPlace/Quay source (io/NetexParser.java, 295 LoC SAX
parser in the reference, used only to enrich stop names
GTFSReadIn.java:790-804).

Spark-first shape: read the XML documents wholetext, parse each file's
StopPlace/Quay hierarchy in a mapInPandas batch (stdlib ElementTree — one
document per row, vectorized at the file level), yield a `quays`
dimension table to left-join against stops on quay id. At scale this is
a one-time dimension build: a few thousand XML files -> one small
broadcastable table.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUAYS_SCHEMA = T.StructType(
    [
        T.StructField("quay_id", T.StringType(), False),
        T.StructField("stop_place_id", T.StringType(), True),
        T.StructField("stop_place_name", T.StringType(), True),
        T.StructField("quay_name", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
    ]
)

_NS = re.compile(r"\{.*\}")


def _local(tag: str) -> str:
    return _NS.sub("", tag)


def parse_netex_quays(xml_text: str) -> list[tuple]:
    """One NeTEx document -> [(quay_id, stop_place_id, sp_name, q_name,
    lat, lon)]. Namespace-agnostic (matches on local names, as the
    reference's SAX handler does)."""
    rows: list[tuple] = []
    root = ET.fromstring(xml_text)
    for sp in root.iter():
        if _local(sp.tag) != "StopPlace":
            continue
        sp_id = sp.get("id")
        sp_name = None
        for child in sp:
            if _local(child.tag) == "Name":
                sp_name = (child.text or "").strip()
                break
        for quay in sp.iter():
            if _local(quay.tag) != "Quay":
                continue
            q_id = quay.get("id")
            q_name, lat, lon = None, None, None
            for el in quay.iter():
                t = _local(el.tag)
                if t == "Name" and q_name is None:
                    q_name = (el.text or "").strip()
                elif t == "Latitude":
                    lat = float(el.text)
                elif t == "Longitude":
                    lon = float(el.text)
            if q_id:
                rows.append((q_id, sp_id, sp_name, q_name, lat, lon))
    return rows


def read_netex_quays(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of NeTEx XML files -> quays dimension DataFrame."""
    docs = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in QUAYS_SCHEMA]
        for pdf in batches:
            rows: list[tuple] = []
            for doc in pdf["value"]:
                rows.extend(parse_netex_quays(doc))
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(parse, QUAYS_SCHEMA)


def enrich_stops_with_netex(stops: DataFrame, quays: DataFrame) -> DataFrame:
    """The reference's name enrichment: stop joins its quay and adopts the
    quay/stop-place name when present (GTFSReadIn.java:790-804)."""
    q = F.broadcast(
        quays.select(
            F.col("quay_id").alias("gtfs_id"),
            F.coalesce("quay_name", "stop_place_name").alias("netex_name"),
        )
    )
    return stops.join(q, "gtfs_id", "left").withColumn(
        "name", F.coalesce("netex_name", "name")
    ).drop("netex_name")
