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


def test_manifest_file_pruning(spark):
    """Iceberg-shaped metadata pruning stand-in: the per-file manifest
    (fcell min/max ranges) must (a) keep results identical to the unpruned
    join and (b) actually SKIP files on a selective query set."""
    from distributed_spatial_index_spark.sources.layout import (
        manifest_pruned_point_range_join,
        manifest_select_files,
        write_manifest,
    )

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem").limit(3)
    with tempfile.TemporaryDirectory() as d:
        write_cell_layout(pts, f"{d}/docs")
        write_manifest(spark, f"{d}/docs")

        got_df = manifest_pruned_point_range_join(spark, f"{d}/docs", qs)
        got = sorted(map(tuple, got_df.collect()))
        expect = sorted(map(tuple, point_range_join(pts, qs).collect()))
        assert got == expect and len(got) > 0

        # file-level skip evidence: a selective query set reads a strict
        # subset of the layout's files
        files, total = manifest_select_files(spark, f"{d}/docs", qs)
        stats = got_df.manifest_stats
        assert stats == {"files_scanned": len(files), "files_total": total}
        assert 0 < len(files) < total, (len(files), total)


def test_manifest_raises_on_appended_files(spark):
    """Freshness contract: data files appended AFTER write_manifest would
    be silently never selected (their matches dropped) — the select must
    cross-check the listing and raise instead."""
    import pytest

    from distributed_spatial_index_spark.sources.layout import (
        list_data_files,
        manifest_select_files,
        write_manifest,
    )

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem").limit(3)
    with tempfile.TemporaryDirectory() as d:
        write_cell_layout(pts, f"{d}/docs")
        write_manifest(spark, f"{d}/docs")
        n_before = len(list_data_files(spark, f"{d}/docs"))
        # fresh manifest passes the check
        files, total = manifest_select_files(spark, f"{d}/docs", qs)
        assert 0 < len(files) < total
        # append a data file the manifest doesn't know about
        (
            pts.limit(3)
            .withColumn("fcell", F.lit(0).cast("long"))
            .withColumn("pcell", F.lit(0).cast("long"))
            .write.mode("append")
            .partitionBy("pcell")
            .parquet(f"{d}/docs")
        )
        assert len(list_data_files(spark, f"{d}/docs")) > n_before
        with pytest.raises(ValueError, match="stale"):
            manifest_select_files(spark, f"{d}/docs", qs)
        # re-running write_manifest restores selectability
        write_manifest(spark, f"{d}/docs")
        files2, total2 = manifest_select_files(spark, f"{d}/docs", qs)
        assert total2 > total and len(files2) >= len(files)


def test_distributed_coarse_cells_match_numpy_oracle(spark):
    """The PRODUCTION distributed derivation (distributed_covering_cells —
    the one helper behind pruned_point_range_join and
    manifest_select_files) must equal the driver-side NumPy derivation
    exactly on the same queries."""
    from distributed_spatial_index_spark.config import (
        COARSE_BITS,
        DEFAULT_REGION,
        EPSILON,
    )
    from distributed_spatial_index_spark.sources.layout import (
        distributed_covering_cells,
        query_coarse_cells,
    )

    qs = src.range_queries(spark, SF_DIR, "lineitem")
    got = sorted(
        r["c"]
        for r in distributed_covering_cells(
            qs, COARSE_BITS, DEFAULT_REGION, EPSILON
        ).collect()
    )
    expect = query_coarse_cells(qs.collect(), COARSE_BITS, DEFAULT_REGION, EPSILON)
    assert got == expect and 0 < len(got) <= 4 ** COARSE_BITS