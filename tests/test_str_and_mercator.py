"""STR sample partitioner invariants + Mercator projection parity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import DEFAULT_REGION
from distributed_spatial_index_spark.functions.cells import morton_np
from distributed_spatial_index_spark.functions.geometry import (
    mercator_xy,
    mercator_xy_np,
)
from distributed_spatial_index_spark.plans.grid import build_str_index

BITS = 6


def test_str_leaves_tile_exactly():
    rng = np.random.default_rng(42)
    pts = np.column_stack([
        rng.uniform(0, DEFAULT_REGION.x_hi, 20000),
        rng.uniform(0, DEFAULT_REGION.y_hi, 20000),
    ])
    g = build_str_index(pts, 16, BITS, DEFAULT_REGION.width, DEFAULT_REGION.height)
    n = 1 << BITS
    cover = np.zeros((n, n), dtype=np.int64)
    for lf in g.leaves:
        cover[lf.x0:lf.x1, lf.y0:lf.y1] += 1
    assert (cover == 1).all()
    assert len({int(p) for p in g.run_pids}) == 16


def test_str_balances_uniform_sample():
    rng = np.random.default_rng(7)
    pts = np.column_stack([
        rng.uniform(0, DEFAULT_REGION.x_hi, 50000),
        rng.uniform(0, DEFAULT_REGION.y_hi, 50000),
    ])
    g = build_str_index(pts, 16, BITS, DEFAULT_REGION.width, DEFAULT_REGION.height)
    n = 1 << BITS
    cx = np.clip((pts[:, 0] / DEFAULT_REGION.width * n).astype(int), 0, n - 1)
    cy = np.clip((pts[:, 1] / DEFAULT_REGION.height * n).astype(int), 0, n - 1)
    pids = g.partition_of_cells(morton_np(cx, cy, BITS))
    loads = np.bincount(pids, minlength=16)
    assert loads.max() <= 3.0 * len(pts) / 16  # grid-snapped, so loose bound
    assert (loads > 0).all()


def test_mercator_spark_vs_numpy(spark):
    lons = np.linspace(-179, 179, 50)
    lats = np.linspace(-85, 85, 50)
    sdf = spark.createDataFrame(
        [(float(lo), float(la)) for lo, la in zip(lons, lats)],
        "lon double, lat double",
    )
    x, y = mercator_xy(F.col("lon"), F.col("lat"))
    rows = sdf.select(x.alias("x"), y.alias("y")).collect()
    ex, ey = mercator_xy_np(lons, lats)
    for r, xe, ye in zip(rows, ex, ey):
        assert abs(r["x"] - xe) < 1e-6 and abs(r["y"] - ye) < 1e-6
    # spot value: equator/prime meridian -> origin
    r0 = sdf.limit(0)
    z = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double").select(
        *mercator_xy(F.col("lon"), F.col("lat"))
    ).collect()[0]
    assert abs(z[0]) < 1e-9 and abs(z[1]) < 1e-9