"""distributed_spatial_index_spark — a PySpark-native distributed spatial-join
and tiling engine.

Brand-new engine with the query capabilities of the reference
(zongleiZhang/distributed-spatial-index, a Flink 1.9 streaming spatial index,
see SURVEY.md), re-expressed Spark-first:

- documents carrying geo-referenced media spans are indexed into hierarchical
  Morton (H3/S2-style) cells via JVM-side column expressions / Arrow UDFs;
- a driver-built two-level grid + sorted-cell-range index (built from a
  density DataFrame with NumPy prefix sums) replaces the reference's
  partition-parallel grid-quadtree (GTree.java) + per-worker RC-trees;
- spatial range join = cell equi-join + vectorized epsilon-MBR refine
  (filter-refine replaces tree descent);
- point-in-polygon joins, kNN via expanding cell-ring search, and
  raster-tile <-> vector assignment extend the reference per the north star;
- skew handled with hot-cell salting + AQE; shuffles replace the reference's
  Redis migration side channel.
"""

from distributed_spatial_index_spark import config  # noqa: F401

__version__ = "0.1.0"
