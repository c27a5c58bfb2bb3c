"""Raster-tile <-> vector assignment (north-star op; generalizes the
reference's density-grid cell assignment, DensityPF.java:26-27,
GridPoint.java:28-56).

tile_id = Morton code of (tile_x, tile_y) at the tile zoom; boundary
convention: half-open cells [lo, hi), floor indexing, clamped to the last
cell (FIXTURES.md §5).  Pure column expressions — whole-stage codegen, no
shuffle at all for the assignment itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import DEFAULT_REGION, TILE_ZOOM, Region
from distributed_spatial_index_spark.functions.cells import cell_id_col, cell_id_sql


def assign_tiles(
    points: DataFrame, zoom: int = TILE_ZOOM, region: Region = DEFAULT_REGION
) -> DataFrame:
    """points(id, x, y, ...) -> (doc_id, tile_id, zoom)."""
    return points.select(
        F.col("id").alias("doc_id"),
        cell_id_col(F.col("x"), F.col("y"), zoom, region).alias("tile_id"),
        F.lit(zoom).alias("zoom"),
    )


def tile_counts(
    points: DataFrame, zoom: int = TILE_ZOOM, region: Region = DEFAULT_REGION
) -> DataFrame:
    """Per-tile doc counts — the rollup used for tile pyramids; one shuffle
    with map-side partial aggregation."""
    return (
        points.select(cell_id_col(F.col("x"), F.col("y"), zoom, region).alias("tile_id"))
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def tile_pyramid(
    points: DataFrame,
    zooms: tuple[int, ...] = (2, 4, 6),
    region: Region = DEFAULT_REGION,
) -> DataFrame:
    """(zoom, tile_id, n_docs) for every zoom level — the rollup a tile
    server materializes.  Cheapest form: aggregate once at the FINEST zoom,
    then roll coarser levels up from parent codes (each level reads the
    previous level's <= 4^bits rows, never the doc table again)."""
    zs = sorted(zooms, reverse=True)
    finest = zs[0]
    base = (
        points.select(
            cell_id_col(F.col("x"), F.col("y"), finest, region).alias("tile_id")
        )
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("zoom", F.lit(finest))
    )
    levels = [base]
    for i, z in enumerate(zs[1:], start=1):
        # parent code = child morton >> 2*dz (floor division composes with
        # the fine-level floor, so rollup counts are exact incl. clamping)
        dz = zs[i - 1] - z
        levels.append(
            levels[-1]
            .select(F.shiftright(F.col("tile_id"), 2 * dz).alias("tile_id"),
                    "n_docs")
            .groupBy("tile_id")
            .agg(F.sum("n_docs").alias("n_docs"))
            .withColumn("zoom", F.lit(z))
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("zoom", "tile_id", "n_docs")


def tile_pyramid_sql(points_sql: str, zooms: tuple[int, ...] = (2, 4, 6),
                     region: Region = DEFAULT_REGION) -> str:
    parts = []
    for z in zooms:
        t = cell_id_sql("x", "y", z, region)
        parts.append(
            f"SELECT {z} AS zoom, {t} AS tile_id, count(*) AS n_docs "
            f"FROM ({points_sql}) GROUP BY 1, 2"
        )
    return " UNION ALL ".join(parts)


def assign_tiles_sql(points_sql: str, zoom: int = TILE_ZOOM,
                     region: Region = DEFAULT_REGION) -> str:
    t = cell_id_sql("x", "y", zoom, region)
    return (
        f"SELECT id AS doc_id, {t} AS tile_id, {zoom} AS zoom "
        f"FROM ({points_sql})"
    )


def tile_counts_sql(points_sql: str, zoom: int = TILE_ZOOM,
                    region: Region = DEFAULT_REGION) -> str:
    t = cell_id_sql("x", "y", zoom, region)
    return (
        f"SELECT {t} AS tile_id, count(*) AS n_docs "
        f"FROM ({points_sql}) GROUP BY 1"
    )
