"""Cell-partitioned layout: results identical + partitions actually pruned."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.range_join import point_range_join
from distributed_spatial_index_spark.sources import tables as src
from distributed_spatial_index_spark.sources.layout import (
    pruned_point_range_join,
    read_cell_layout,
    write_cell_layout,
)
from tests.conftest import SF_DIR


def test_layout_pruned_join(spark):
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    # few queries -> few coarse cells -> visible pruning
    qs = src.range_queries(spark, SF_DIR, "lineitem").limit(3)
    with tempfile.TemporaryDirectory() as d:
        write_cell_layout(pts, f"{d}/docs")
        layout = read_cell_layout(spark, f"{d}/docs")

        got = sorted(map(tuple, pruned_point_range_join(layout, qs).collect()))
        expect = sorted(map(tuple, point_range_join(pts, qs).collect()))
        assert got == expect and len(got) > 0

        # pruning evidence: Catalyst pushes the pcell predicate into the
        # scan's PartitionFilters (directory-level pruning for a
        # hive-partitioned table is then done by FileSourceStrategy)
        pruned = layout.filter(F.col("pcell").isin([0, 1]))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        import re
        pf = re.search(r"PartitionFilters: \[(.*?)\]", plan)
        assert pf and "pcell" in pf.group(1) and "IN" in pf.group(1).upper()
        # and the scanned row count shrinks accordingly
        assert pruned.count() < layout.count()