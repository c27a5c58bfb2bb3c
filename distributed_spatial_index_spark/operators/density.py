"""Density-grid aggregation (reference I1, DensityPF.java:23-36).

The reference counts segment centers per grid cell into an int[128][128] on a
single parallelism-1 task (a global bottleneck flagged in SURVEY.md §3.1).
Here it's a groupBy on the fine Morton cell — distributed, map-side partial
aggregation, with at most (2^bits)^2 result rows (16 384 at bits=7), small
enough to collect on the driver to build the partition map (plans/grid.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import DEFAULT_REGION, FINE_BITS, Region
from distributed_spatial_index_spark.functions.cells import (
    cell_id_col,
    cell_id_sql,
    morton_decode_np,
)


def density_grid(
    points: DataFrame, bits: int = FINE_BITS, region: Region = DEFAULT_REGION
) -> DataFrame:
    """points(x, y) -> (cell, n) per fine Morton cell."""
    return (
        points.select(cell_id_col(F.col("x"), F.col("y"), bits, region).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def density_grid_sql(points_sql: str, bits: int = FINE_BITS,
                     region: Region = DEFAULT_REGION) -> str:
    c = cell_id_sql("x", "y", bits, region)
    return f"SELECT {c} AS cell, count(*) AS n FROM ({points_sql}) GROUP BY 1"


def density_matrix(density_df: DataFrame, bits: int = FINE_BITS) -> np.ndarray:
    """Collect the density DataFrame into the reference's int[n][n] snapshot
    (Density.java:12-21) for the driver-side grid builder."""
    n = 1 << bits
    mat = np.zeros((n, n), dtype=np.int64)
    rows = density_df.collect()
    codes = np.array([r["cell"] for r in rows], dtype=np.int64)
    counts = np.array([r["n"] for r in rows], dtype=np.int64)
    if len(codes):
        cx, cy = morton_decode_np(codes, bits)
        mat[cx, cy] = counts
    return mat
