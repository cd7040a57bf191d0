"""Capture the literal-pinned g-queries' outputs at every testdata SF.

The g-queries' oracles are pinned VALUES literals (driver_queries.py
g-section header). Round 6 extends the convention from one scale to all
driver SFs: each literal carries an `sf_key` column — the `orders` row
count, unique per SF (1500 / 15,000 / 150,000) and visible to DuckDB —
and the oracle filters to the current scale's rows. This tool captures
the rows to pin: run it twice under DIFFERENT parallelism (e.g. cpus 8
vs 32 with different shuffle partitions), diff the two JSONs, and only
then bake values in (the g01-convention stability check, now per SF).

Usage: python tools/pin_oracle_literals.py out.json [cpus] [shuffle_partitions]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = ("sf0.001", "sf0.01", "sf0.1")

PINNED = [
    "g01_images_assign_categories",
    "g02_vincenty_knn",
    "g03_cell_index",
    "g04_mosaic",
    "g05_pip_wkb",
    "g06_lsh_ann_recall",
    "g07_ivf_ann_recall",
    "g09_compare_world",
    "g10_node_modifies",
    "g11_phash_near_dup",
    "g12_audio_wav_stats",
    "g13_video_shot_cuts",
    "g14_mosaic_pyramid",
    "g15_image_curation",
    "g16_tile_fetch",
    "g17_ivf_stored_search",
    "g18_pq_ann",
]


def main() -> int:
    out_path = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sp = int(sys.argv[3]) if len(sys.argv) > 3 else None

    import duckdb

    from gtfs_osm_sync_spark.driver_queries import QUERIES
    from gtfs_osm_sync_spark.session import get_spark

    spark = get_spark(cpus)
    if sp:
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))

    out: dict[str, dict[str, list]] = {}
    for sf in SF_DIRS:
        sf_dir = f"/root/testdata/{sf}"
        key = duckdb.sql(
            f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
        ).fetchone()[0]
        for name in PINNED:
            rows = [list(r) for r in QUERIES[name](spark, sf_dir).collect()]
            out.setdefault(name, {})[str(key)] = rows
            print(f"{sf} {name}: {len(rows)} rows", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
