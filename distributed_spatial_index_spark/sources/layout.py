"""Cell-partitioned storage layout: spatial partition pruning at the scan.

The reference prunes by routing through its in-memory GTree
(GTree.java:395-407); a table engine gets the same effect from LAYOUT: write
the doc table hive-partitioned by the coarse Morton cell (and range-sorted
by the fine cell within partitions), and any query whose coarse cells are
known prunes whole directories before a byte is read — Catalyst shows them
under PartitionFilters.  On Iceberg the same write becomes
``writeTo(...).partitionedBy(...)`` with cell-range metadata pruning; this
module is the parquet-fallback shape of that layout.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import (
    COARSE_BITS,
    DEFAULT_REGION,
    EPSILON,
    JOIN_BITS,
    Region,
)
from distributed_spatial_index_spark.functions.cells import (
    cell_coord_np,
    cell_id_col,
    morton_np,
)
from distributed_spatial_index_spark.operators.range_join import point_range_join


def write_cell_layout(
    points: DataFrame,
    path: str,
    coarse_bits: int = COARSE_BITS,
    fine_bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
) -> None:
    """points(id, x, y, ...) -> parquet partitioned by coarse cell, rows
    range-clustered by fine cell inside each partition (so row-group stats
    also prune within a partition)."""
    df = points.withColumn(
        "pcell", cell_id_col(F.col("x"), F.col("y"), coarse_bits, region)
    ).withColumn(
        "fcell", cell_id_col(F.col("x"), F.col("y"), fine_bits, region)
    )
    (
        df.repartitionByRange(F.col("pcell"), F.col("fcell"))
        .sortWithinPartitions("pcell", "fcell")
        .write.mode("overwrite")
        .partitionBy("pcell")
        .parquet(path)
    )


def read_cell_layout(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def query_coarse_cells(
    queries_rows: list,
    coarse_bits: int = COARSE_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> list[int]:
    """Coarse cells overlapped by any query rect (driver-side NumPy over the
    small query list) — the static pruning predicate."""
    n = 1 << coarse_bits
    cells: set[int] = set()
    for r in queries_rows:
        x0 = int(cell_coord_np(np.array([r["xmin"] - eps]), region.x_lo, region.width, coarse_bits)[0])
        x1 = int(cell_coord_np(np.array([r["xmax"] + eps]), region.x_lo, region.width, coarse_bits)[0])
        y0 = int(cell_coord_np(np.array([r["ymin"] - eps]), region.y_lo, region.height, coarse_bits)[0])
        y1 = int(cell_coord_np(np.array([r["ymax"] + eps]), region.y_lo, region.height, coarse_bits)[0])
        cx, cy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1), indexing="ij")
        cells.update(int(c) for c in morton_np(cx.ravel(), cy.ravel(), coarse_bits))
    return sorted(cells)


def pruned_point_range_join(
    layout: DataFrame,
    queries: DataFrame,
    coarse_bits: int = COARSE_BITS,
    fine_bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """Range join over a cell-partitioned table: prune partitions by the
    queries' coarse cells first (directory-level skip), then the normal
    fine-cell route + refine."""
    qrows = queries.select("query_id", "xmin", "ymin", "xmax", "ymax").collect()
    cells = query_coarse_cells(qrows, coarse_bits, region, eps)
    pruned = layout.filter(F.col("pcell").isin(cells))
    return point_range_join(
        pruned.select("id", "x", "y"), queries, bits=fine_bits, region=region,
        eps=eps,
    )
