"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB at the given SF dir, then compares row count, column names, and
order-insensitive values (sorted by column name, rows sorted). Exits
non-zero on any mismatch. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod
    from gtfs_osm_sync_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(sdf)} (no oracle, rows-only) {t_spark:.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if len(sdf) != len(odf):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(sdf)} duckdb={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            ok = False
            print(
                f"FAIL {name}: columns spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}"
            )
        if ok:
            a, b = norm(sdf), norm(odf)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            except AssertionError as e:
                ok = False
                msg = str(e).split("\n")[0]
                print(f"FAIL {name}: values differ: {msg}")
                # show first diff rows for debugging
                n = min(len(a), len(b))
                neq = (a.iloc[:n].values != b.iloc[:n].values).any(axis=1)
                idx = neq.nonzero()[0][:3] if neq.any() else []
                for i in idx:
                    print(f"  spark : {a.iloc[i].to_dict()}")
                    print(f"  duckdb: {b.iloc[i].to_dict()}")
        if ok:
            print(f"ok   {name}: rows={len(sdf)} match {t_spark:.1f}s")
        else:
            failures.append(name)

    print(f"\n{n_run - len(failures)}/{n_run} queries match")
    # full sweeps leave a committed record (BENCH/oracle_local.json):
    # the driver grades a fixed query list, so this is the evidence
    # trail for entries outside it
    if not only:
        import json
        import subprocess

        build = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=REPO,
        ).stdout.strip()
        rec = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "build": build,
            "sf_dir": sf_dir,
            "n_queries": n_run,
            "n_match": n_run - len(failures),
            "failures": failures,
        }
        # per-SF records coexist: the default SF keeps the historical
        # filename, other SFs get a sibling keyed by dir basename
        base = os.path.basename(os.path.normpath(sf_dir))
        fname = (
            "oracle_local.json" if base == "sf0.01"
            else f"oracle_local_{base}.json"
        )
        path = os.path.join(REPO, "BENCH", fname)
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"recorded {path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
