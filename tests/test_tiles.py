"""Tile operators vs their SQL twins.  tile_counts lost its driver-gate
row in the 50-row consolidation (tile_pyramid's zoom-4 level is the same
aggregation at TILE_ZOOM=4), so its verification lives here: the DuckDB
oracle AND the containment claim the consolidation rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.tiles import (
    tile_counts,
    tile_counts_sql,
    tile_pyramid,
)
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR, assert_same_rows


def test_tile_counts_matches_oracle(spark, ddb):
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    got = tile_counts(pts)
    rows = ddb.execute(tile_counts_sql(src.geo_points_sql("lineitem"))).fetchall()
    assert_same_rows(got, rows)


def test_tile_counts_equals_pyramid_zoom4_level(spark):
    """The consolidation premise: tile_counts (TILE_ZOOM=4) is byte-for-byte
    the zoom-4 slice of tile_pyramid, so the pyramid gate covers it."""
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    counts = sorted(map(tuple, tile_counts(pts).collect()))
    level4 = sorted(
        map(tuple,
            tile_pyramid(pts).filter(F.col("zoom") == 4)
            .select("tile_id", "n_docs").collect())
    )
    assert counts == level4 and len(counts) > 0
