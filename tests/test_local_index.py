"""Per-partition local-index join must equal the cell equi-join path."""

from __future__ import annotations

from distributed_spatial_index_spark.operators.density import (
    density_grid,
    density_matrix,
)
from distributed_spatial_index_spark.operators.local_index import (
    local_index_range_join,
)
from distributed_spatial_index_spark.operators.range_join import point_range_join
from distributed_spatial_index_spark.plans.grid import build_grid_index
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR

BITS = 6


def test_local_index_join_equals_equijoin(spark):
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    grid = build_grid_index(
        density_matrix(density_grid(pts, bits=BITS), bits=BITS), 8, bits=BITS
    )
    got = sorted(map(tuple, local_index_range_join(pts, qs, grid).collect()))
    expect = sorted(map(tuple, point_range_join(pts, qs).collect()))
    assert got == expect and len(got) > 0