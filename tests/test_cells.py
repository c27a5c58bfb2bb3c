"""Morton cell kernels: Spark Column, NumPy, and SQL forms must agree."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import DEFAULT_REGION
from distributed_spatial_index_spark.functions import cells as C


def test_morton_roundtrip_np():
    rng = np.random.default_rng(42)
    cx = rng.integers(0, 128, 1000)
    cy = rng.integers(0, 128, 1000)
    code = C.morton_np(cx, cy, 7)
    rx, ry = C.morton_decode_np(code, 7)
    assert (rx == cx).all() and (ry == cy).all()
    assert code.min() >= 0 and code.max() < 128 * 128


def test_cell_id_three_forms_agree(spark, ddb):
    rng = np.random.default_rng(7)
    xs = rng.uniform(-10, DEFAULT_REGION.x_hi + 10, 500)  # incl. out-of-region clamp
    ys = rng.uniform(-10, DEFAULT_REGION.y_hi + 10, 500)
    np_ids = C.cell_id_np(xs, ys, 7)

    sdf = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    ).select(C.cell_id_col(F.col("x"), F.col("y"), 7).alias("c"))
    spark_ids = np.array([r["c"] for r in sdf.collect()])
    assert (np.sort(spark_ids) == np.sort(np_ids)).all()

    ddb.execute("CREATE OR REPLACE TABLE _pts AS SELECT unnest(?) AS x, unnest(?) AS y",
                [xs.tolist(), ys.tolist()])
    sql_ids = np.array(
        [r[0] for r in ddb.execute(
            f"SELECT {C.cell_id_sql('x', 'y', 7)} FROM _pts").fetchall()]
    )
    assert (np.sort(sql_ids) == np.sort(np_ids)).all()


def test_covering_cells(spark):
    # rect spanning multiple cells: every contained point's cell is covered
    sdf = spark.createDataFrame(
        [(100.0, 100.0, 300.0, 350.0)], "xmin double, ymin double, xmax double, ymax double"
    ).select(C.covering_cells_col(
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), bits=7
    ).alias("cells"))
    cells = set(sdf.collect()[0]["cells"])
    # corners + center of the rect must map into covered cells
    for x, y in [(100.0, 100.0), (300.0, 350.0), (200.0, 225.0), (100.0, 350.0)]:
        assert int(C.cell_id_np(np.array([x]), np.array([y]), 7)[0]) in cells
    assert len(cells) == len(set(cells))


def test_parent_cell(spark):
    sdf = spark.range(0, 1000).select(
        F.col("id").alias("fine"),
        C.parent_cell_col(F.col("id"), 7, 4).alias("coarse"),
    )
    for r in sdf.collect():
        fx, fy = C.morton_decode_np(np.array([r["fine"]]), 7)
        px, py = C.morton_decode_np(np.array([r["coarse"]]), 4)
        assert px[0] == fx[0] >> 3 and py[0] == fy[0] >> 3
