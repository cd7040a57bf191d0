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


def read_netex_quays(
    spark: SparkSession, path: str, split_bytes: int | None = None
) -> DataFrame:
    """Directory/glob of NeTEx XML files -> quays dimension DataFrame.

    Default: one wholetext task per file (NeTEx ships one modest export
    per agency in practice — the reference loads exactly one,
    GTFSReadIn.java:790-804). split_bytes=N fans ONE giant export over
    ceil(size/N) byte-range tasks, reusing the osmxml boundary scan with
    '<StopPlace' as the top-level tag; `path` must then be a concrete
    file path (or list), and elements must carry the default namespace
    (a prefixed '<netex:StopPlace' is invisible to the raw byte scan —
    such files fall back to split_bytes=None, enforced by a clear
    ValueError from the chunk parse)."""
    if split_bytes:
        return _read_netex_split(spark, path, split_bytes)
    docs = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in QUAYS_SCHEMA]
        for pdf in batches:
            rows: list[tuple] = []
            for doc in pdf["value"]:
                rows.extend(parse_netex_quays(doc))
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(parse, QUAYS_SCHEMA)


_SP_TAGS = (b"<StopPlace",)


def _parse_netex_range(path: str, start: int, end: int) -> list[tuple]:
    """Parse the StopPlace elements whose boundary falls in [start, end):
    same slicing contract as osmxml._parse_range, with the fragment
    trimmed to the last '</StopPlace>' (between consecutive StopPlaces a
    NeTEx export holds only whitespace — they share one stopPlaces
    container — so the trim only drops the trailing parent close tags of
    the final chunk)."""
    import os

    from .osmxml import _find_boundary

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        b0 = _find_boundary(f, start, tags=_SP_TAGS)
        if b0 is None or b0 >= end:
            return []
        b1 = _find_boundary(f, end, tags=_SP_TAGS) if end < size else None
        f.seek(b0)
        data = f.read((b1 if b1 is not None else size) - b0)
    k = data.rfind(b"</StopPlace>")
    if k < 0:
        return []
    data = data[: k + len(b"</StopPlace>")]
    try:
        return parse_netex_quays(
            (b"<root>" + data + b"</root>").decode("utf-8", errors="replace")
        )
    except ET.ParseError as ex:
        raise ValueError(
            f"byte-range chunk [{start},{end}) of {path} failed to parse "
            f"({ex}). Namespace-prefixed StopPlace tags or interleaved "
            "containers defeat the raw boundary scan — re-read with "
            "split_bytes=None."
        ) from ex


def _read_netex_split(
    spark: SparkSession, paths: list[str] | str, split_bytes: int
) -> DataFrame:
    import os

    if isinstance(paths, str):
        paths = [paths]
    tasks = []
    for p in paths:
        size = os.path.getsize(p)
        for s in range(0, max(size, 1), split_bytes):
            tasks.append((p, s, min(s + split_bytes, size)))
    files = spark.createDataFrame(
        tasks, "path string, start long, end long"
    ).repartition(max(len(tasks), 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in QUAYS_SCHEMA]
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                rows = _parse_netex_range(row.path, int(row.start), int(row.end))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, QUAYS_SCHEMA)


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
