"""Bucketed co-located join: identical results + the shuffle actually gone.

The claim under test is physical, not just semantic: with both tables
bucketed on the routing cell, the ONLY Exchange left in the plan is the
one shuffling the (small) result set for dropDuplicates — the doc-side
shuffle the salted plan pays per query batch is eliminated by the layout.
"""

from __future__ import annotations

import tempfile

from distributed_spatial_index_spark.operators.range_join import point_range_join
from distributed_spatial_index_spark.plans.bucketing import (
    bucketed_point_range_join,
    count_exchanges,
    physical_plan_str,
    write_bucketed_points,
    write_bucketed_query_cells,
)
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR


def _no_broadcast(spark):
    """Force the shuffled-regime planner (the regime bucketing serves):
    in production the query side is too big to broadcast; at sf0.001 it
    isn't, so disable auto-broadcast while planning these joins."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return old


def test_bucketed_join_matches_and_drops_the_shuffle(spark):
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    old = _no_broadcast(spark)
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(pts, "t_bkt_pts", f"{d}/pts", n_buckets=4)
            write_bucketed_query_cells(qs, "t_bkt_qc", f"{d}/qc", n_buckets=4)

            out = bucketed_point_range_join(spark, "t_bkt_pts", "t_bkt_qc")

            # plan shape: both scans bucketed, exactly ONE Exchange (the
            # result dedup) — vs >= 3 for the same join on unbucketed
            # inputs (both join sides + dedup)
            plan = physical_plan_str(out)
            assert plan.count("Bucketed: true") == 2, plan
            assert count_exchanges(out) == 1, plan
            unbucketed = point_range_join(pts, qs, broadcast_queries=False)
            assert count_exchanges(unbucketed) >= 3

            got = sorted(map(tuple, out.collect()))
            expect = sorted(map(tuple, point_range_join(pts, qs).collect()))
            assert got == expect and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bkt_pts")
        spark.sql("DROP TABLE IF EXISTS t_bkt_qc")


def test_bucketed_scan_prunes_buckets_on_cell_filter(spark):
    """Bucket pruning: an equality filter on the bucket column reads only
    the matching bucket (SelectedBucketsCount in the scan) — the
    bucket-level analog of the layout module's directory/manifest skips."""
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    # autoBucketedScan off: the planner DISABLES bucketed reads for plans
    # with no join/agg to serve ("Bucketed: false (disabled by query
    # planner)"), which also skips bucket pruning for a bare filter
    abs_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old_abs = spark.conf.get(abs_key)
    spark.conf.set(abs_key, "false")
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(pts, "t_bkt_prune", f"{d}/pts", n_buckets=4)
            t = spark.table("t_bkt_prune")
            some_cell = t.select("cell").first()["cell"]
            plan = physical_plan_str(t.filter(t.cell == some_cell))
            assert "SelectedBucketsCount: 1 out of 4" in plan, plan
    finally:
        spark.conf.set(abs_key, old_abs)
        spark.sql("DROP TABLE IF EXISTS t_bkt_prune")


def test_salted_bucketed_join_spreads_hot_cells_and_matches(spark):
    """Skew handling at ingest: with a hot-cell list, the salt becomes part
    of the bucket spec — the join stays Exchange-free on (cell, salt) and a
    hot cell's docs genuinely land under several salt sub-keys."""
    from pyspark.sql import functions as F

    from distributed_spatial_index_spark.operators.density import density_grid
    from distributed_spatial_index_spark.plans.partitioning import (
        hot_cells_from_density,
    )

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    from distributed_spatial_index_spark.config import JOIN_BITS

    # hot cells must be derived at the SAME resolution the layout buckets
    # at (JOIN_BITS) — density_grid's default FINE_BITS ids would match
    # nothing in the bucketed table.  Every multi-doc cell counts as hot
    # (threshold=1): the fan-out assertion below takes the max across ALL
    # hot cells, so the fixture doesn't hinge on one cell's xxhash draws.
    dens = density_grid(pts, bits=JOIN_BITS)
    max_n = dens.agg(F.max("n")).first()[0]
    assert max_n >= 2, "fixture needs a cell with multiple docs"
    hot = hot_cells_from_density(dens, threshold=1)
    assert hot, "fixture must yield at least one hot cell"
    old = _no_broadcast(spark)
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(
                pts, "t_sbkt_pts", f"{d}/pts", n_buckets=4, hot=hot, n_salt=4
            )
            write_bucketed_query_cells(
                qs, "t_sbkt_qc", f"{d}/qc", n_buckets=4, hot=hot, n_salt=4
            )
            out = bucketed_point_range_join(spark, "t_sbkt_pts", "t_sbkt_qc")

            plan = physical_plan_str(out)
            assert plan.count("Bucketed: true") == 2, plan
            assert count_exchanges(out) == 1, plan

            # hot cells' docs really fan out across salt sub-keys (xxhash
            # is deterministic, so check the best fan-out across all hot
            # cells rather than betting on one cell's hash draw)
            n_salts = (
                spark.table("t_sbkt_pts")
                .filter(F.col("cell").isin([int(h) for h in hot]))
                .groupBy("cell")
                .agg(F.countDistinct("salt").alias("ns"))
                .agg(F.max("ns")).first()[0]
            )
            assert n_salts > 1, n_salts

            got = sorted(map(tuple, out.collect()))
            expect = sorted(map(tuple, point_range_join(pts, qs).collect()))
            assert got == expect and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_sbkt_pts")
        spark.sql("DROP TABLE IF EXISTS t_sbkt_qc")


def test_bucketed_join_refuses_mismatched_specs(spark):
    """Every spec mismatch between the two writes (bucket count, salting,
    refine eps beyond the written padding) is a silent wrong answer or a
    silently reinstated shuffle — the join must raise instead."""
    import pytest

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(pts, "t_mm_pts", f"{d}/pts", n_buckets=4)
            write_bucketed_query_cells(qs, "t_mm_qc8", f"{d}/qc8", n_buckets=8)
            with pytest.raises(ValueError, match="spec mismatch"):
                bucketed_point_range_join(spark, "t_mm_pts", "t_mm_qc8")

            write_bucketed_query_cells(
                qs, "t_mm_qc_salted", f"{d}/qcs", n_buckets=4, hot=[0], n_salt=4
            )
            with pytest.raises(ValueError, match="dsi.salted"):
                bucketed_point_range_join(spark, "t_mm_pts", "t_mm_qc_salted")

            write_bucketed_query_cells(qs, "t_mm_qc", f"{d}/qc", n_buckets=4)
            with pytest.raises(ValueError, match="eps"):
                bucketed_point_range_join(
                    spark, "t_mm_pts", "t_mm_qc", eps=1.0
                )
            # matching specs still work
            assert bucketed_point_range_join(
                spark, "t_mm_pts", "t_mm_qc"
            ).count() > 0
    finally:
        for t in ("t_mm_pts", "t_mm_qc8", "t_mm_qc_salted", "t_mm_qc"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_refuses_region_and_kind_mismatch(spark):
    """Two more silent-wrong-answer classes the spec check must catch:
    (a) tables written under different REGIONS carry incomparable cell ids
    (same (x, y), different cell) — every other spec key matches, so only
    a recorded region property can refuse the join; (b) swapped arguments
    (or a query table written with the points writer) must name the actual
    mistake, not die on a downstream KeyError."""
    import pytest

    from distributed_spatial_index_spark.config import Region

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(pts, "t_rm_pts", f"{d}/pts", n_buckets=4)
            # TAXI-BJ-shaped region: every bound differs from DIDI-CD's
            write_bucketed_query_cells(
                qs, "t_rm_qc_bj", f"{d}/qc_bj", n_buckets=4,
                region=Region(-100.0, -100.0, 10000.0, 10000.0),
            )
            with pytest.raises(ValueError, match="dsi.region"):
                bucketed_point_range_join(spark, "t_rm_pts", "t_rm_qc_bj")

            write_bucketed_query_cells(qs, "t_rm_qc", f"{d}/qc", n_buckets=4)
            # swapped arguments: caught by the kind check, loudly
            with pytest.raises(ValueError, match="dsi.kind"):
                bucketed_point_range_join(spark, "t_rm_qc", "t_rm_pts")
            # a "queries" table written with the POINTS writer: same check
            with pytest.raises(ValueError, match="dsi.kind"):
                bucketed_point_range_join(spark, "t_rm_pts", "t_rm_pts")
    finally:
        for t in ("t_rm_pts", "t_rm_qc_bj", "t_rm_qc"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
