"""The load-bearing test: the deterministic geometry derivation must be
bit-for-bit identical between Spark and DuckDB, or no spatial oracle works."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_spatial_index_spark.functions import geo_derive as gd
from distributed_spatial_index_spark.config import X_HI, X_LO, Y_HI, Y_LO


def test_spark_duckdb_bit_identical(spark, ddb):
    ids = list(range(0, 5000, 7)) + [123456789, 987654321]
    sdf = spark.createDataFrame([(i,) for i in ids], "id long").select(
        "id",
        gd.derive_x_col(F.col("id")).alias("x"),
        gd.derive_y_col(F.col("id")).alias("y"),
        gd.derive_ts_col(F.col("id")).alias("ts"),
    )
    spark_rows = {r["id"]: (r["x"], r["y"], r["ts"]) for r in sdf.collect()}

    ddb.execute("CREATE OR REPLACE TABLE _ids AS SELECT unnest(?) AS id", [ids])
    sql = (
        f"SELECT id, {gd.derive_x_sql('id')} AS x, {gd.derive_y_sql('id')} AS y, "
        f"{gd.derive_ts_sql('id')} AS ts FROM _ids"
    )
    for i, x, y, ts in ddb.execute(sql).fetchall():
        sx, sy, sts = spark_rows[i]
        # exact float equality on purpose — the oracle hash-compares values
        assert sx == x and sy == y and sts == ts, (i, sx, x, sy, y, sts, ts)


def test_points_in_region(spark):
    sdf = spark.range(0, 20000).select(
        gd.derive_x_col(F.col("id")).alias("x"),
        gd.derive_y_col(F.col("id")).alias("y"),
    )
    row = sdf.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    assert row[0] >= X_LO and row[1] <= X_HI
    assert row[2] >= Y_LO and row[3] <= Y_HI


def test_skew_exists(spark):
    """~40% of points must land in the 3 hot clusters (density-split fodder)."""
    sdf = spark.range(0, 20000).select(
        gd.derive_x_col(F.col("id")).alias("x"),
        gd.derive_y_col(F.col("id")).alias("y"),
    )
    in_cluster = None
    for cx, cy in gd.CLUSTERS:
        cond = (F.abs(F.col("x") - cx) <= gd.CLUSTER_HALF) & (
            F.abs(F.col("y") - cy) <= gd.CLUSTER_HALF
        )
        in_cluster = cond if in_cluster is None else (in_cluster | cond)
    n = sdf.filter(in_cluster).count()
    assert n >= 0.39 * 20000  # 40% by construction, minus boundary noise
