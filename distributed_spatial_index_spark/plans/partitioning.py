"""Applying the grid index on the cluster + explicit skew handling.

The reference migrates indexed data between workers through Redis when the
partition map changes (LocalTreePF.java:108-151); in Spark the shuffle IS the
migration: recompute the map, repartition, done (SURVEY.md I5/I6).

Salting (north rule): a hot cell whose (docs x queries) product explodes the
shuffled cell-join gets ``n_salt`` sub-keys — doc side hashes into one, query
side duplicates into all — bounding any single task's probe work.  Only
relevant for the shuffled-join path (query side too big to broadcast); the
broadcast path never shuffles the doc side at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import DEFAULT_REGION, EPSILON, Region
from distributed_spatial_index_spark.functions.cells import cell_id_col
from distributed_spatial_index_spark.functions.geometry import rect_contains_point
from distributed_spatial_index_spark.operators.range_join import explode_query_cells
from distributed_spatial_index_spark.plans.grid import GridIndex


def with_partition_col(
    df: DataFrame,
    grid: GridIndex,
    x: str = "x",
    y: str = "y",
    out: str = "pid",
    region: Region = DEFAULT_REGION,
) -> DataFrame:
    """Add the grid partition id for each point: cell id (codegen'd column
    math) -> binary search over the broadcast sorted-cell-range index
    (Arrow-vectorized pandas UDF; the run arrays are tiny)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((grid.run_starts, grid.run_pids))

    @F.pandas_udf("long")
    def _pid(cell: pd.Series) -> pd.Series:
        starts, pids = bc.value
        idx = np.searchsorted(starts, cell.to_numpy(), side="right") - 1
        idx = np.clip(idx, 0, len(starts) - 1)
        return pd.Series(pids[idx])

    return df.withColumn(
        out, _pid(cell_id_col(F.col(x), F.col(y), grid.bits, region))
    )


def grid_repartition(
    df: DataFrame, grid: GridIndex, x: str = "x", y: str = "y",
    region: Region = DEFAULT_REGION,
) -> DataFrame:
    """Co-locate rows by grid partition (the shuffle that replaces the
    reference's keyBy(leafID) + Redis migration)."""
    return with_partition_col(df, grid, x, y, region=region).repartition(
        grid.num_partitions, F.col("pid")
    )


def hot_cells_from_density(
    density_df: DataFrame, threshold: int
) -> list[int]:
    """Cells whose count exceeds ``threshold`` (salting candidates).  The
    density DataFrame is tiny (<= 4^bits rows) so the collect is safe."""
    return [
        r["cell"] for r in density_df.filter(F.col("n") > threshold).collect()
    ]


def hot_cell_lookup(spark, hot: list[int]) -> DataFrame:
    """The broadcast-joinable hot-cell membership table (cell, is_hot) —
    see salted_point_range_join's docstring for why a lookup JOIN beats
    an O(hot) in-expression per probe row.  Built as a pure-JVM literal
    plan (functions/local_rel.py): a createDataFrame relation would pay
    one Python-worker round-trip per partition on EVERY broadcast
    build."""
    from distributed_spatial_index_spark.functions.local_rel import (
        jvm_local_df,
    )

    return jvm_local_df(
        spark, [(int(h),) for h in hot], "cell long"
    ).withColumn("is_hot", F.lit(True))


def salt_doc_side(df: DataFrame, hot_df: DataFrame, n_salt: int) -> DataFrame:
    """Add the doc-side salt to a frame that already has a ``cell`` column:
    hot cells hash into one of n_salt sub-keys, cold cells take salt 0."""
    return df.join(F.broadcast(hot_df), "cell", "left").withColumn(
        "salt",
        F.when(
            F.col("is_hot"), F.pmod(F.xxhash64(F.col("id")), F.lit(n_salt))
        ).otherwise(F.lit(0).cast("long")),
    ).drop("is_hot")


def salt_query_side(qcells: DataFrame, hot_df: DataFrame, n_salt: int) -> DataFrame:
    """Duplicate hot-cell query rows into every salt bucket (cold rows keep
    salt 0) so the (cell, salt) equi-join sees every doc sub-bucket."""
    return qcells.join(F.broadcast(hot_df), "cell", "left").withColumn(
        "salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.when(F.col("is_hot"), F.lit(n_salt - 1))
                .otherwise(F.lit(0))
                .cast("long"),
            )
        ),
    ).drop("is_hot")


def salted_point_range_join(
    points: DataFrame,
    queries: DataFrame,
    hot: list[int],
    n_salt: int = 8,
    bits: int | None = None,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """Shuffled-join variant of point_range_join with hot-cell salting.

    Doc side: salt = pmod(xxhash64(id), n_salt) on hot cells, 0 elsewhere.
    Query side: hot-cell rows duplicate into all salt buckets.  Join key
    (cell, salt) splits a hot cell's probe across n_salt tasks; results are
    identical to the unsalted join (tests assert equality).

    Hot-cell membership is a broadcast-hash-joined lookup table, NOT an
    in-expression array literal: ``array_contains`` over an N-element
    literal is O(N) per row outside codegen's reach (measured 7x slower on
    the 600k-doc bench with 234 hot cells) and its expression tree grows
    with the hot list, while the broadcast join costs O(1) per row at any
    hot-set size.
    """
    from distributed_spatial_index_spark.config import JOIN_BITS

    bits = bits or JOIN_BITS
    spark = points.sparkSession
    hot_df = hot_cell_lookup(spark, hot)

    pts = points.withColumn("cell", cell_id_col(F.col("x"), F.col("y"), bits, region))
    pts = salt_doc_side(pts, hot_df, n_salt)
    q = salt_query_side(explode_query_cells(queries, bits, region, eps),
                        hot_df, n_salt)
    joined = pts.join(q, ["cell", "salt"]).filter(
        rect_contains_point(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col("x"), F.col("y"), eps,
        )
    )
    return (
        joined.select("query_id", F.col("id").alias("doc_id"))
        .dropDuplicates(["query_id", "doc_id"])
    )
