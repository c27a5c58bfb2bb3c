"""Range-join correctness vs brute-force oracles (the reference's oracle-diff
strategy, ResultCompare.java:11-41: order-insensitive set equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import EPSILON, LOGIC_WINDOW, WINDOW_MS
from distributed_spatial_index_spark.functions.geometry import (
    rect_contains_point,
    rects_intersect,
)
from distributed_spatial_index_spark.operators.range_join import (
    mbr_range_join,
    point_range_join,
)
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR, assert_same_rows


def test_point_range_join_vs_crossjoin_oracle(spark):
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    got = point_range_join(pts, qs)

    oracle = (
        pts.crossJoin(qs)
        .filter(rect_contains_point(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col("x"), F.col("y"), EPSILON))
        .select("query_id", F.col("id").alias("doc_id"))
        .distinct()
    )
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in oracle.collect())
    assert a == b and len(a) > 0


def test_point_range_join_vs_duckdb(spark, ddb):
    got = point_range_join(
        src.geo_points(spark, SF_DIR, "lineitem"),
        src.range_queries(spark, SF_DIR, "lineitem"),
    )
    rows = ddb.execute(
        f"""
        SELECT DISTINCT q.query_id, p.id AS doc_id
        FROM ({src.geo_points_sql('lineitem')}) p,
             ({src.range_queries_sql('lineitem')}) q
        WHERE p.x >= q.xmin - {EPSILON!r} AND p.x <= q.xmax + {EPSILON!r}
          AND p.y >= q.ymin - {EPSILON!r} AND p.y <= q.ymax + {EPSILON!r}
        """
    ).fetchall()
    assert_same_rows(got, rows)


def test_epsilon_boundary():
    """A point epsilon-outside the rect must still match (Rectangle.java:280)."""
    from distributed_spatial_index_spark.session import get_spark

    spark = get_spark(cores=2)
    pts = spark.createDataFrame(
        [(1, 100.0 + 20.0 + 0.5e-5, 100.0, 0),   # just inside the eps pad
         (2, 100.0 + 20.0 + 5e-5, 100.0, 0)],    # outside even with pad
        "id long, x double, y double, ts long",
    )
    qs = spark.createDataFrame(
        [(7, 80.0, 80.0, 120.0, 120.0)],
        "query_id long, xmin double, ymin double, xmax double, ymax double",
    )
    got = {tuple(r) for r in point_range_join(pts, qs).collect()}
    assert got == {(7, 1)}


def test_mbr_range_join_vs_crossjoin_oracle(spark):
    """Docs as small MBRs (segments): boundary-crossing duplication must be
    deduped by the merge stage (QueryResultPF.java:44-48)."""
    pts = src.geo_points(spark, SF_DIR, "lineitem").limit(0)  # schema only
    docs = (
        src.geo_points(spark, SF_DIR, "lineitem")
        .select(
            "id",
            (F.col("x") - 30.0).alias("xmin"), (F.col("y") - 30.0).alias("ymin"),
            (F.col("x") + 30.0).alias("xmax"), (F.col("y") + 30.0).alias("ymax"),
        )
    )
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    got = mbr_range_join(docs, qs)
    oracle = (
        docs.crossJoin(qs.select(
            "query_id",
            F.col("xmin").alias("qxmin"), F.col("ymin").alias("qymin"),
            F.col("xmax").alias("qxmax"), F.col("ymax").alias("qymax")))
        .filter(rects_intersect(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col("qxmin"), F.col("qymin"), F.col("qxmax"), F.col("qymax"), EPSILON))
        .select("query_id", F.col("id").alias("doc_id"))
        .distinct()
    )
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in oracle.collect())
    assert a == b and len(a) > 0


def test_multires_join_vs_duckdb(spark, ddb):
    from distributed_spatial_index_spark.operators.range_join import (
        multires_range_join,
    )

    got = multires_range_join(
        src.geo_points(spark, SF_DIR, "lineitem"),
        src.mixed_range_queries(spark, SF_DIR, "lineitem"),
    )
    rows = ddb.execute(
        f"""
        SELECT DISTINCT q.query_id, p.id AS doc_id
        FROM ({src.geo_points_sql('lineitem')}) p,
             ({src.mixed_range_queries_sql('lineitem')}) q
        WHERE p.x >= q.xmin - {EPSILON!r} AND p.x <= q.xmax + {EPSILON!r}
          AND p.y >= q.ymin - {EPSILON!r} AND p.y <= q.ymax + {EPSILON!r}
        """
    ).fetchall()
    assert_same_rows(got, rows)
    # the mixed workload must actually exercise both levels
    qs = src.mixed_range_queries(spark, SF_DIR, "lineitem")
    thr = 8.0 * 8626.0 / (1 << 10)
    n_small = qs.filter((F.col("xmax") - F.col("xmin")) <= thr).count()
    n_large = qs.filter((F.col("xmax") - F.col("xmin")) > thr).count()
    assert n_small > 0 and n_large > 0


def test_horizon_filter(spark):
    """Logical sliding window: only docs within the horizon are indexed
    (LocalTreePF.java:69)."""
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    horizon = LOGIC_WINDOW * WINDOW_MS
    end = 1477958400000 + 1200 * 1000
    got = point_range_join(pts, qs, horizon_ms=horizon, horizon_end_ms=end)
    oracle = point_range_join(
        pts.filter((F.col("ts") >= end - horizon) & (F.col("ts") < end)), qs
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, oracle.collect()))
