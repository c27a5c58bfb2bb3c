"""Segment-former semantics vs the reference's stateful flatMap
(ToInputItemFlatMap.java:23-47): always-replace last point; drop stationary
and jump segments."""

from __future__ import annotations

from distributed_spatial_index_spark.operators.segments import (
    form_segments,
    segments_sql,
)
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR, assert_same_rows


def test_segments_vs_duckdb(spark, ddb):
    got = form_segments(src.trajectory_points(spark, SF_DIR))
    rows = ddb.execute(segments_sql(src.trajectory_points_sql())).fetchall()
    assert_same_rows(got, rows)
    assert got.count() > 0


def test_stationary_and_jump_filters(spark):
    pts = spark.createDataFrame(
        [
            # tid 1: normal -> emitted
            (1, 1, 1000, 0.0, 0.0),
            (1, 2, 2000, 10.0, 10.0),
            # stationary (eps): dropped, but still replaces the anchor
            (1, 3, 3000, 10.0 + 1e-7, 10.0),
            # next segment pairs with the STATIONARY point, not the old one
            (1, 4, 4000, 20.0, 20.0),
            # jump > 400 on x: dropped
            (1, 5, 5000, 600.0, 20.0),
            # pairs with the jump point (anchor was replaced)
            (1, 6, 6000, 610.0, 25.0),
        ],
        "tid long, seq long, ts long, x double, y double",
    )
    got = sorted(
        (r["x1"], r["y1"], r["x2"], r["y2"]) for r in form_segments(pts).collect()
    )
    assert got == sorted([
        (0.0, 0.0, 10.0, 10.0),
        (10.0 + 1e-7, 10.0, 20.0, 20.0),
        (600.0, 20.0, 610.0, 25.0),
    ])
