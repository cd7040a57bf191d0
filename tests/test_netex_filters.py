"""NeTEx source (S8), text report (K3), and P6-P8 member filters."""

from pyspark.sql import functions as F

from gtfs_osm_sync_spark.sources import netex as NX
from gtfs_osm_sync_spark.sources.sinks import text_report
from gtfs_osm_sync_spark.functions.tags import (
    fixme_filter,
    member_role_filter,
    negative_id_filter,
)

_NETEX_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<PublicationDelivery xmlns="http://www.netex.org.uk/netex">
  <dataObjects>
    <SiteFrame>
      <stopPlaces>
        <StopPlace id="SP1">
          <Name>Central Station</Name>
          <quays>
            <Quay id="Q1">
              <Name>Platform A</Name>
              <Centroid><Location>
                <Longitude>-82.45</Longitude><Latitude>28.05</Latitude>
              </Location></Centroid>
            </Quay>
            <Quay id="Q2"></Quay>
          </quays>
        </StopPlace>
      </stopPlaces>
    </SiteFrame>
  </dataObjects>
</PublicationDelivery>
"""


def test_parse_netex_quays():
    rows = NX.parse_netex_quays(_NETEX_DOC)
    byq = {r[0]: r for r in rows}
    assert set(byq) == {"Q1", "Q2"}
    assert byq["Q1"][1] == "SP1" and byq["Q1"][2] == "Central Station"
    assert byq["Q1"][3] == "Platform A"
    assert byq["Q1"][4] == 28.05 and byq["Q1"][5] == -82.45
    assert byq["Q2"][3] is None


def test_netex_enrichment(spark, tmp_path):
    p = tmp_path / "netex.xml"
    p.write_text(_NETEX_DOC)
    quays = NX.read_netex_quays(spark, str(p))
    assert quays.count() == 2
    stops = spark.createDataFrame(
        [("Q1", "old name"), ("X9", "keep me")], "gtfs_id string, name string"
    )
    out = {r["gtfs_id"]: r["name"] for r in NX.enrich_stops_with_netex(stops, quays).collect()}
    assert out["Q1"] == "Platform A" and out["X9"] == "keep me"


def test_netex_split_matches_wholetext(spark, tmp_path):
    """Byte-range fan-out of ONE large NeTEx export (split on
    '<StopPlace' boundaries via the osmxml scanner) yields the same quay
    table as the single-task wholetext parse, at several chunk sizes."""
    sps = "\n".join(
        f"""        <StopPlace id="SP{i}">
          <Name>Station {i}</Name>
          <quays>
            <Quay id="Q{i}a"><Name>Plat {i}A</Name>
              <Centroid><Location>
                <Longitude>{-82.0 - i * 0.01}</Longitude><Latitude>{28.0 + i * 0.01}</Latitude>
              </Location></Centroid>
            </Quay>
            <Quay id="Q{i}b"></Quay>
          </quays>
        </StopPlace>"""
        for i in range(40)
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<PublicationDelivery xmlns="http://www.netex.org.uk/netex">\n'
        "  <dataObjects><SiteFrame><stopPlaces>\n"
        f"{sps}\n"
        "      </stopPlaces></SiteFrame></dataObjects>\n"
        "</PublicationDelivery>\n"
    )
    p = tmp_path / "big_netex.xml"
    p.write_text(doc)
    whole = sorted(map(tuple, NX.read_netex_quays(spark, str(p)).collect()))
    assert len(whole) == 80
    import os

    size = os.path.getsize(p)
    for nbytes in (999, 5000, size // 2 + 1):
        got = sorted(map(tuple, NX.read_netex_quays(
            spark, str(p), split_bytes=nbytes
        ).collect()))
        assert got == whole, f"split_bytes={nbytes} diverged"


def test_text_report(spark):
    df = spark.createDataFrame(
        [
            ("0001", "A St", "MODIFY"),
            ("0002", "B St", "MODIFY"),
            ("0003", "C St", "NOTHING_NEW"),
        ],
        "gtfs_id string, name string, category string",
    )
    rpt = text_report(df)
    assert "== MODIFY ==" in rpt and "== NOTHING_NEW ==" in rpt
    assert "1. 0001 A St" in rpt and "2. 0002 B St" in rpt
    # numbering restarts per category
    assert "1. 0003 C St" in rpt


def test_member_filters(spark):
    df = spark.createDataFrame(
        [
            ("1", {"name": "x"}, "platform", True, "101"),
            ("2", {"FIXME": "check"}, "platform", True, "102"),
            ("3", {"name": "y"}, "", True, "103"),
            ("4", {"name": "z"}, "stop", True, "-5"),
            ("5", {"name": "w"}, "platform", False, "105"),
        ],
        "id string, tags map<string,string>, role string, in_gtfs boolean, ref string",
    )
    out = df.select(
        "id",
        fixme_filter(F.col("tags")).alias("p6"),
        negative_id_filter(F.col("ref")).alias("p7"),
        member_role_filter(
            F.col("role"), F.lit("platform"), F.col("in_gtfs")
        ).alias("p8"),
    ).collect()
    got = {r["id"]: (r["p6"], r["p7"], r["p8"]) for r in out}
    assert got["2"][0] is False  # FIXME-tagged dropped (P6)
    assert got["1"][0] is True
    assert got["4"][1] is False  # negative id dropped (P7)
    assert got["3"][2] is False  # empty role dropped (P8)
    assert got["5"][2] is False  # platform not in GTFS dropped (P8)
    assert got["1"][2] is True
