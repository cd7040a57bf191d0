"""gtfs_osm_sync_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``reubot/gtfs-osm-sync`` (a Java GTFS<->OSM entity matcher), re-expressed as an
idiomatic Spark DataFrame engine over image+caption tables at web scale:

- deterministic geotagging (phash -> lat/lon),
- H3-style hex / S2 level-15 cell indexing (pure-numpy vectorized UDFs),
- cell-prejoined radius joins + cell-ring-expansion kNN (k=5, haversine,
  mirroring the reference's 400 m stop-matching radius),
- point-in-polygon ray casting over WKB,
- 4-way match categorization + tag diff/merge,
- scored route/relation joins,
- per-H3-cell raster mosaics,
- atomic snapshot tables with per-partition lineage checkpoints + resume.

Reference semantics citations use file:line paths relative to
/root/reference/GO_Sync/src/main/java/edu/usf/cutr/go_sync/.
"""

__version__ = "0.1.0"
