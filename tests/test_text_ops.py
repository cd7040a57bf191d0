"""Dataset-curation stats operators: stratified quota sampling +
token-length histogram (round 6)."""

from __future__ import annotations

from pyspark.sql import functions as F



def test_quota_sample_caps_and_is_deterministic(spark):
    from gtfs_osm_sync_spark.operators.text import quota_sample

    rows = [(i, "src%d" % (i % 3), "x") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, text STRING")
    got = quota_sample(df, "source", 10)
    counts = {r["source"]: r["n"] for r in
              got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"src0": 10, "src1": 10, "src2": 10}
    # deterministic: same ids every run; different salt -> different draw
    ids1 = sorted(r["doc_id"] for r in got.collect())
    ids2 = sorted(r["doc_id"] for r in quota_sample(df, "source", 10).collect())
    assert ids1 == ids2
    ids3 = sorted(
        r["doc_id"] for r in quota_sample(df, "source", 10, salt="v2").collect()
    )
    assert ids1 != ids3
    # groups under the cap keep everything
    small = quota_sample(df.filter(F.col("doc_id") < 6), "source", 10)
    assert small.count() == 6
    # scale shape: the rank cut runs BELOW the exchange (WindowGroupLimit)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_token_histogram_hand_checked(spark):
    from gtfs_osm_sync_spark.operators.text import token_histogram

    df = spark.createDataFrame(
        [(1, "a", "w " * 7 + "w"), (2, "a", "w " * 15 + "w"), (3, "b", "w")],
        "doc_id BIGINT, source STRING, text STRING",
    )
    # docs: 8 tokens -> bucket 1, 16 -> bucket 2, 1 -> bucket 0
    got = {(r["source"], r["bucket"]): r["n_docs"]
           for r in token_histogram(df).collect()}
    assert got == {("a", 1): 1, ("a", 2): 1, ("b", 0): 1}
