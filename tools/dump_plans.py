"""Dump .explain("formatted") for named driver queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
e.g.   python tools/dump_plans.py r07 before q10_knn q09_radius_join

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) on a small
local session — plan SHAPE does not depend on input scale for these
queries (broadcast sides are explicit hints, not size-estimated).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from gtfs_osm_sync_spark.session import get_spark
from gtfs_osm_sync_spark import driver_queries as dq


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [
        "q10_knn",
        "q09_radius_join",
        "q11_match_categories",
        "q01_pricing_summary",
        "q03_revenue_by_nation",
        "q08_variant_dedup",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(cpus=4, app_name="dump_plans")
    for name in names:
        df = dq.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
