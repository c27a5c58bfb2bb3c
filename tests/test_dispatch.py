"""Join-regime dispatch (plans/dispatch.py): the chosen regime follows
the documented evidence, and every regime returns the SAME rows."""

from __future__ import annotations

import tempfile

import pytest

from distributed_spatial_index_spark.operators.range_join import (
    point_range_join,
)
from distributed_spatial_index_spark.plans.dispatch import (
    point_range_join_auto,
)
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_small_query_side_broadcasts(spark):
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    out = point_range_join_auto(spark, pts, qs)
    assert out.join_plan["regime"] == "broadcast"
    assert out.join_plan["n_queries"] == qs.count()
    assert _rows(out) == _rows(point_range_join(pts, qs))


def test_big_query_side_salts(spark):
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    # force the "too big to broadcast" branch; skew_factor=1 so the
    # sparse sf0.001 grid still yields a non-empty hot set
    out = point_range_join_auto(
        spark, pts, qs, broadcast_rows=0, skew_factor=1
    )
    assert out.join_plan["regime"] == "salted"
    assert out.join_plan["n_hot_cells"] > 0
    assert "density aggregation" in out.join_plan["evidence"]
    assert _rows(out) == _rows(point_range_join(pts, qs))


def test_both_landed_goes_bucketed(spark):
    from distributed_spatial_index_spark.plans.bucketing import (
        write_bucketed_points,
        write_bucketed_query_cells,
    )

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(pts, "t_dsp_pts", f"{d}/pts", n_buckets=4)
            write_bucketed_query_cells(qs, "t_dsp_qc", f"{d}/qc", n_buckets=4)
            out = point_range_join_auto(spark, "t_dsp_pts", "t_dsp_qc")
            assert out.join_plan["regime"] == "bucketed"
            assert "metadata only" in out.join_plan["evidence"]
            assert _rows(out) == _rows(point_range_join(pts, qs))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dsp_pts")
        spark.sql("DROP TABLE IF EXISTS t_dsp_qc")


def test_landed_points_salts_from_committed_density(spark):
    from distributed_spatial_index_spark.plans.bucketing import (
        write_bucketed_manifest,
        write_bucketed_points,
    )

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(pts, "t_dsp_lp", f"{d}/pts", n_buckets=4)
            write_bucketed_manifest(spark, "t_dsp_lp")
            out = point_range_join_auto(
                spark, "t_dsp_lp", qs, broadcast_rows=0, skew_factor=1
            )
            assert out.join_plan["regime"] == "salted"
            assert "committed density" in out.join_plan["evidence"]
            assert out.join_plan["n_hot_cells"] > 0
            assert _rows(out) == _rows(point_range_join(pts, qs))

            # region-mismatched caller: the committed density's cell ids
            # live in the table's region, so the summary must NOT feed a
            # join under a different region — falls back to aggregating,
            # same answers (salting never changes results)
            from distributed_spatial_index_spark.config import (
                DEFAULT_REGION,
                Region,
            )

            other = Region(
                DEFAULT_REGION.x_lo, DEFAULT_REGION.y_lo,
                DEFAULT_REGION.x_hi + 1.0, DEFAULT_REGION.y_hi,
            )
            out_r = point_range_join_auto(
                spark, "t_dsp_lp", qs, broadcast_rows=0, skew_factor=1,
                region=other,
            )
            assert out_r.join_plan["regime"] == "salted"
            assert "density aggregation" in out_r.join_plan["evidence"]
            assert _rows(out_r) == _rows(
                point_range_join(pts, qs, region=other)
            )

            # never-manifested landed table: falls back to aggregating,
            # same answers (dsi.path now points at a layout with no
            # committed metadata; the table's own location is untouched)
            spark.sql(
                "ALTER TABLE t_dsp_lp SET TBLPROPERTIES "
                f"('dsi.path'='{d}/fresh')"
            )
            out2 = point_range_join_auto(
                spark, "t_dsp_lp", qs, broadcast_rows=0, skew_factor=1
            )
            assert out2.join_plan["regime"] == "salted"
            assert "density aggregation" in out2.join_plan["evidence"]
            assert _rows(out2) == _rows(point_range_join(pts, qs))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dsp_lp")


def test_queries_name_without_landed_points_refused(spark):
    from distributed_spatial_index_spark.plans.bucketing import (
        write_bucketed_query_cells,
    )

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_query_cells(qs, "t_dsp_q", f"{d}/qc", n_buckets=4)
            with pytest.raises(ValueError, match="pre-exploded"):
                point_range_join_auto(spark, pts, "t_dsp_q")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dsp_q")
