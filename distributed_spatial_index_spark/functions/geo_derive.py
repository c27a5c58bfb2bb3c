"""Deterministic geometry derivation from integer ids — dual Spark/SQL forms.

The driver's testdata tables carry no coordinates, so spatial workloads derive
(x, y, ts) from an integer id with pure integer arithmetic followed by IEEE
double ops in a fixed evaluation order.  Spark and DuckDB then compute
bit-identical doubles, which lets the DuckDB oracle verify spatial joins
exactly (the same trick the reference plays with its deterministic
single-node oracle, SingleNodeIndexPF.java / ResultCompare.java).

Distribution: 40% of points fall in 3 Gaussian-ish hot-spot clusters (to
exercise density splitting + hot-cell salting, cf. GTree.java:164-202), the
rest uniform over the DIDI-CD region.  Every formula below exists as a Spark
Column and a SQL string with IDENTICAL operation order; tests/test_derive.py
asserts bit-for-bit equality between the two engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import (
    EPOCH_MS,
    X_HI,
    Y_HI,
)

# LCG-style mixing constants; M is a power of two so hash/M is an exact double.
A_X, C_X = 1103515245, 12345
A_Y, C_Y = 69069, 99991
M = 1 << 20

# Hot-spot cluster centers (inside the region, away from edges).
CLUSTERS = [(2000.0, 2100.0), (6100.0, 7000.0), (4300.0, 4400.0)]
CLUSTER_HALF = 200.0  # cluster extent: +-200 units
HOT_MOD, HOT_LT = 10, 4  # id % 10 < 4  -> 40% of points are clustered

TS_SPREAD_S = 3600  # timestamps spread over 1 hour (60 windows of 60 s)


def _u_col(id_col: Column, a: int, c: int) -> Column:
    return ((id_col * F.lit(a) + F.lit(c)) % F.lit(M)) / F.lit(M)


def _u_sql(id_expr: str, a: int, c: int) -> str:
    # CAST keeps DuckDB from doing INT32 arithmetic that overflows.
    return (
        f"(((CAST(({id_expr}) AS BIGINT) * CAST({a} AS BIGINT) + {c}) % {M}) / {M})"
    )


def derive_x_col(id_col: Column) -> Column:
    ux = _u_col(id_col, A_X, C_X)
    hot = (id_col % HOT_MOD) < HOT_LT
    c = id_col % 3
    cx = (
        F.when(c == 0, F.lit(CLUSTERS[0][0]))
        .when(c == 1, F.lit(CLUSTERS[1][0]))
        .otherwise(F.lit(CLUSTERS[2][0]))
    )
    return F.when(
        hot, cx + (ux * F.lit(2 * CLUSTER_HALF) - F.lit(CLUSTER_HALF))
    ).otherwise(ux * F.lit(X_HI))


def derive_y_col(id_col: Column) -> Column:
    uy = _u_col(id_col, A_Y, C_Y)
    hot = (id_col % HOT_MOD) < HOT_LT
    c = id_col % 3
    cy = (
        F.when(c == 0, F.lit(CLUSTERS[0][1]))
        .when(c == 1, F.lit(CLUSTERS[1][1]))
        .otherwise(F.lit(CLUSTERS[2][1]))
    )
    return F.when(
        hot, cy + (uy * F.lit(2 * CLUSTER_HALF) - F.lit(CLUSTER_HALF))
    ).otherwise(uy * F.lit(Y_HI))


def derive_ts_col(id_col: Column) -> Column:
    """Epoch-ms timestamp spread over TS_SPREAD_S seconds from EPOCH_MS."""
    return F.lit(EPOCH_MS) + (id_col % F.lit(TS_SPREAD_S)) * F.lit(1000)


def derive_x_sql(id_expr: str) -> str:
    ux = _u_sql(id_expr, A_X, C_X)
    cx = (
        f"(CASE ({id_expr}) % 3 WHEN 0 THEN {CLUSTERS[0][0]!r} "
        f"WHEN 1 THEN {CLUSTERS[1][0]!r} ELSE {CLUSTERS[2][0]!r} END)"
    )
    return (
        f"(CASE WHEN (({id_expr}) % {HOT_MOD}) < {HOT_LT} "
        f"THEN {cx} + ({ux} * {2 * CLUSTER_HALF!r} - {CLUSTER_HALF!r}) "
        f"ELSE {ux} * {X_HI!r} END)"
    )


def derive_y_sql(id_expr: str) -> str:
    uy = _u_sql(id_expr, A_Y, C_Y)
    cy = (
        f"(CASE ({id_expr}) % 3 WHEN 0 THEN {CLUSTERS[0][1]!r} "
        f"WHEN 1 THEN {CLUSTERS[1][1]!r} ELSE {CLUSTERS[2][1]!r} END)"
    )
    return (
        f"(CASE WHEN (({id_expr}) % {HOT_MOD}) < {HOT_LT} "
        f"THEN {cy} + ({uy} * {2 * CLUSTER_HALF!r} - {CLUSTER_HALF!r}) "
        f"ELSE {uy} * {Y_HI!r} END)"
    )


def derive_ts_sql(id_expr: str) -> str:
    return f"({EPOCH_MS} + (({id_expr}) % {TS_SPREAD_S}) * 1000)"
