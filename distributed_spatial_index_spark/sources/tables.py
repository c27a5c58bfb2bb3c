"""Testdata table loaders + deterministic geo enrichment.

Replaces the reference's text-file replay source (StreamingJob.java:121-127)
with parquet scans.  Every loader has a matching DuckDB SQL builder producing
bit-identical rows, used by the oracle gate (__spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import QUERY_RADIUS, QUERY_RATIO
from distributed_spatial_index_spark.functions import geo_derive as gd


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- integer id per table (unique, stable, oracle-expressible) -------------

_ID_COL = {
    "documents": lambda: F.col("doc_id"),
    "lineitem": lambda: F.col("l_orderkey") * F.lit(10) + F.col("l_linenumber"),
    "events": lambda: F.col("event_id"),
}

_ID_SQL = {
    "documents": "doc_id",
    "lineitem": "(l_orderkey * 10 + l_linenumber)",
    "events": "event_id",
}


def geo_points(
    spark: SparkSession,
    sf_dir: str,
    table: str = "lineitem",
    parallelism: int | None = None,
) -> DataFrame:
    """(id, x, y, ts) point table derived deterministically from ``table``.

    Column pruning: only the id-carrying columns are read from parquet.

    ``parallelism``: repartition the narrow id column BEFORE deriving, so the
    derivation + cell math + join probe run that wide.  Needed when the input
    is a single parquet row group (scan parallelism 1); at real scale files
    split naturally and this should stay None.
    """
    id_col = _ID_COL[table]()
    raw = load(spark, sf_dir, table).select(id_col.alias("id"))
    if parallelism:
        raw = raw.repartition(parallelism)
    return raw.select(
        "id",
        gd.derive_x_col(F.col("id")).alias("x"),
        gd.derive_y_col(F.col("id")).alias("y"),
        gd.derive_ts_col(F.col("id")).alias("ts"),
    )


def geo_points_sql(table: str = "lineitem") -> str:
    i = _ID_SQL[table]
    return (
        f"SELECT {i} AS id, {gd.derive_x_sql(i)} AS x, "
        f"{gd.derive_y_sql(i)} AS y, {gd.derive_ts_sql(i)} AS ts FROM {table}"
    )


def range_queries(
    spark: SparkSession,
    sf_dir: str,
    table: str = "lineitem",
    ratio: int = QUERY_RATIO,
    radius: float = QUERY_RADIUS,
) -> DataFrame:
    """Every ``ratio``-th point spawns a query rect of half-width ``radius``
    around it (ToInputItemFlatMap.java:32-36, Rectangle.java:149-155).

    Residue 3 (not 0) because lineitem-derived ids are ``okey*10 + ln`` with
    ``ln`` in 1..7 — residue 0 mod 150 would never occur there.
    """
    pts = geo_points(spark, sf_dir, table).filter((F.col("id") % ratio) == 3)
    r = F.lit(radius)
    return pts.select(
        F.col("id").alias("query_id"),
        F.col("ts").alias("qts"),
        (F.col("x") - r).alias("xmin"),
        (F.col("y") - r).alias("ymin"),
        (F.col("x") + r).alias("xmax"),
        (F.col("y") + r).alias("ymax"),
    )


def scaled_geo_points(
    spark: SparkSession,
    sf_dir: str,
    table: str = "lineitem",
    scale: int = 8,
    parallelism: int | None = None,
) -> DataFrame:
    """geo_points with a deterministic fan-out: every input row derives
    ``scale`` points (id = base_id * scale + j).  Used by the bench to reach
    a data size where the parallel fraction dominates scheduling overhead —
    the 10^12-doc design point scaled down, not up-sampled randomness."""
    id_col = _ID_COL[table]()
    raw = load(spark, sf_dir, table).select(id_col.alias("base_id"))
    if parallelism:
        raw = raw.repartition(parallelism)
    ids = raw.select(
        F.explode(
            F.sequence(
                F.col("base_id") * scale, F.col("base_id") * scale + (scale - 1)
            )
        ).alias("id")
    )
    return ids.select(
        "id",
        gd.derive_x_col(F.col("id")).alias("x"),
        gd.derive_y_col(F.col("id")).alias("y"),
        gd.derive_ts_col(F.col("id")).alias("ts"),
    )


def mixed_range_queries(
    spark: SparkSession, sf_dir: str, table: str = "lineitem",
    ratio: int = QUERY_RATIO, big_radius: float = 500.0,
) -> DataFrame:
    """range_queries with every 7th query blown up to a big rect — the mixed
    workload for the two-level (multi-resolution) router."""
    pts = geo_points(spark, sf_dir, table).filter((F.col("id") % ratio) == 3)
    # multiplicative-hash selector: ~1/7 of queries are big regardless of
    # the id residue structure of the source table
    r = F.when(
        (F.col("id") * F.lit(2654435761) % F.lit(7)) == 0, F.lit(big_radius)
    ).otherwise(F.lit(QUERY_RADIUS))
    return pts.select(
        F.col("id").alias("query_id"),
        (F.col("x") - r).alias("xmin"),
        (F.col("y") - r).alias("ymin"),
        (F.col("x") + r).alias("xmax"),
        (F.col("y") + r).alias("ymax"),
    )


def mixed_range_queries_sql(
    table: str = "lineitem", ratio: int = QUERY_RATIO, big_radius: float = 500.0
) -> str:
    r = (
        f"(CASE WHEN (CAST(id AS BIGINT) * 2654435761) % 7 = 0 "
        f"THEN {big_radius!r} ELSE {QUERY_RADIUS!r} END)"
    )
    return (
        f"SELECT id AS query_id, x - {r} AS xmin, y - {r} AS ymin, "
        f"x + {r} AS xmax, y + {r} AS ymax "
        f"FROM ({geo_points_sql(table)}) WHERE id % {ratio} = 3"
    )


def knn_queries(
    spark: SparkSession, sf_dir: str, table: str = "lineitem", ratio: int = QUERY_RATIO
) -> DataFrame:
    """Every ``ratio``-th point becomes a kNN query center (FIXTURES.md §4)."""
    return (
        geo_points(spark, sf_dir, table)
        .filter((F.col("id") % ratio) == 3)
        .select(F.col("id").alias("query_id"), "x", "y")
    )


def knn_queries_sql(table: str = "lineitem", ratio: int = QUERY_RATIO) -> str:
    return (
        f"SELECT id AS query_id, x, y FROM ({geo_points_sql(table)}) "
        f"WHERE id % {ratio} = 3"
    )


def unique_geo_points(
    spark: SparkSession, sf_dir: str, table: str = "lineitem",
    parallelism: int | None = None,
) -> DataFrame:
    """geo_points deduped by id (x, y, ts are functions of id, so full-row
    distinct == id-distinct); kNN requires unique doc ids."""
    return geo_points(spark, sf_dir, table, parallelism).dropDuplicates(["id"])


def unique_geo_points_sql(table: str = "lineitem") -> str:
    return f"SELECT DISTINCT * FROM ({geo_points_sql(table)})"


def trajectory_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tid, seq, ts, x, y) trajectory stream derived from the events table:
    tid = user_id, ts = event-time epoch millis, geometry from event_id.
    Stands in for the reference's taxi TSV replay (StreamingJob.java:121)."""
    ev = load(spark, sf_dir, "events")
    i = F.col("event_id")
    return ev.select(
        F.col("user_id").alias("tid"),
        i.alias("seq"),
        # events.ts is TIMESTAMP_NTZ; session TZ is UTC so the cast matches
        # DuckDB's epoch_ms on the naive timestamp
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts"),
        gd.derive_x_col(i).alias("x"),
        gd.derive_y_col(i).alias("y"),
    )


def trajectory_points_sql() -> str:
    return (
        "SELECT user_id AS tid, event_id AS seq, epoch_ms(ts) AS ts, "
        f"{gd.derive_x_sql('event_id')} AS x, {gd.derive_y_sql('event_id')} AS y "
        "FROM events"
    )


def range_queries_sql(
    table: str = "lineitem", ratio: int = QUERY_RATIO, radius: float = QUERY_RADIUS
) -> str:
    return (
        f"SELECT id AS query_id, ts AS qts, "
        f"x - {radius!r} AS xmin, y - {radius!r} AS ymin, "
        f"x + {radius!r} AS xmax, y + {radius!r} AS ymax "
        f"FROM ({geo_points_sql(table)}) WHERE id % {ratio} = 3"
    )
