"""The engine must work over any Region — exercised with the reference's
second dataset shape (TAXI-BJ: region 1,929,725 x 1,828,070,
Constants.java:111-137)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import Region
from distributed_spatial_index_spark.operators.knn import knn
from distributed_spatial_index_spark.operators.range_join import point_range_join
from distributed_spatial_index_spark.operators.tiles import assign_tiles

BJ = Region(x_lo=0.0, y_lo=0.0, x_hi=1_929_725.0, y_hi=1_828_070.0)


def _pts(spark, n=4000, seed=1):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, BJ.x_hi, n)
    ys = rng.uniform(0, BJ.y_hi, n)
    return spark.createDataFrame(
        [(i, float(xs[i]), float(ys[i]), 0) for i in range(n)],
        "id long, x double, y double, ts long",
    ), np.column_stack([xs, ys])


def test_range_join_taxi_bj_region(spark):
    pts, arr = _pts(spark)
    rng = np.random.default_rng(2)
    q = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(0, BJ.x_hi, 40), rng.uniform(0, BJ.y_hi, 40)))]
    r = 40_000.0
    qs = spark.createDataFrame(
        [(i, x - r, y - r, x + r, y + r) for i, x, y in q],
        "query_id long, xmin double, ymin double, xmax double, ymax double",
    )
    got = {tuple(t) for t in point_range_join(pts, qs, region=BJ).collect()}
    expect = set()
    for i, x, y in q:
        hit = np.flatnonzero(
            (np.abs(arr[:, 0] - x) <= r + 1e-5) & (np.abs(arr[:, 1] - y) <= r + 1e-5)
        )
        expect.update((i, int(h)) for h in hit)
    assert got == expect and len(got) > 0


def test_knn_taxi_bj_region(spark):
    pts, arr = _pts(spark, n=2000)
    qs = spark.createDataFrame(
        [(1, 1_000_000.0, 900_000.0), (2, 5.0, 5.0)],
        "query_id long, x double, y double",
    )
    got = sorted(map(tuple, knn(pts, qs, k=4, r0=50_000.0, region=BJ).collect()))
    for qid, qx, qy in [(1, 1_000_000.0, 900_000.0), (2, 5.0, 5.0)]:
        d2 = (arr[:, 0] - qx) ** 2 + (arr[:, 1] - qy) ** 2
        order = np.lexsort((np.arange(len(arr)), d2))[:4]
        mine = [t for t in got if t[0] == qid]
        assert [t[2] for t in mine] == [int(i) for i in order]


def test_tiles_taxi_bj_region(spark):
    pts, arr = _pts(spark, n=500)
    tiles = assign_tiles(pts, zoom=3, region=BJ)
    rows = tiles.collect()
    assert all(0 <= r["tile_id"] < 64 for r in rows)
    # corner point maps to tile 0's quadrant
    one = assign_tiles(
        spark.createDataFrame([(9, 1.0, 1.0)], "id long, x double, y double"),
        zoom=3, region=BJ,
    ).collect()[0]
    assert one["tile_id"] == 0

def test_bucketed_join_taxi_bj_region(spark):
    """The landed bucketed join must honor a non-default Region end to end
    (cells computed at write time, NumPy oracle as the independent check)."""
    import tempfile

    from distributed_spatial_index_spark.plans.bucketing import (
        bucketed_point_range_join,
        write_bucketed_points,
        write_bucketed_query_cells,
    )

    pts, arr = _pts(spark, n=3000, seed=3)
    rng = np.random.default_rng(4)
    q = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(0, BJ.x_hi, 25), rng.uniform(0, BJ.y_hi, 25)))]
    r = 60_000.0
    qs = spark.createDataFrame(
        [(i, x - r, y - r, x + r, y + r) for i, x, y in q],
        "query_id long, xmin double, ymin double, xmax double, ymax double",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(
                pts, "t_bj_pts", f"{d}/pts", n_buckets=4, region=BJ
            )
            write_bucketed_query_cells(
                qs, "t_bj_qc", f"{d}/qc", n_buckets=4, region=BJ
            )
            got = {tuple(t) for t in bucketed_point_range_join(
                spark, "t_bj_pts", "t_bj_qc"
            ).collect()}
        expect = set()
        for i, x, y in q:
            hit = np.flatnonzero(
                (np.abs(arr[:, 0] - x) <= r + 1e-5)
                & (np.abs(arr[:, 1] - y) <= r + 1e-5)
            )
            expect.update((i, int(h)) for h in hit)
        assert got == expect and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bj_pts")
        spark.sql("DROP TABLE IF EXISTS t_bj_qc")
