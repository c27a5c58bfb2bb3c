"""Distributed spatial range join: cell equi-join + epsilon-MBR refine.

Spark-first re-expression of the reference's route -> per-worker-index-probe
-> merge pipeline (GlobalTreePF.java:51-72 routing, RCtree.rectQuery
LocalTreePF.java:79-84 probe, QueryResultPF.java:44-51 merge+dedup):

- routing  = explode(covering_cells(rect)) and an equi-join on the Morton
  cell id — Catalyst plans it as a broadcast or shuffled hash join; the
  reference's hand-placed keyBy shuffles disappear;
- probe    = vectorized epsilon predicate (whole-stage codegen), replacing
  RC-tree descent;
- merge    = dropDuplicates on (query_id, doc_id), replacing the per-window
  HashSet union (boundary-duplicated MBR docs collapse here);
- logical sliding window = event-time range predicate (LocalTreePF.java:69
  eviction semantics recomputed declaratively, SURVEY.md I13).

Scale notes (100 TB / 1000 executors): the doc side shuffles at most once, on
the cell id; with queries small relative to docs the query side broadcasts
and the doc side doesn't shuffle at all.  Hot cells are handled by AQE skew
splitting plus optional explicit salting (plans/partitioning.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import (
    DEFAULT_REGION,
    EPSILON,
    JOIN_BITS,
    LOGIC_WINDOW,
    WINDOW_MS,
    Region,
)
from distributed_spatial_index_spark.functions.cells import (
    cell_id_col,
    covering_cells_col,
)
from distributed_spatial_index_spark.functions.geometry import (
    rect_contains_point,
    rects_intersect,
)


def explode_query_cells(
    queries: DataFrame,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """One row per (query, covering cell); the rect is epsilon-padded first so
    a point matching the padded predicate from a neighbor cell still meets its
    query (J1 routing duplication, GlobalTreePF.java:58-63)."""
    e = F.lit(eps)
    return queries.withColumn(
        "cell",
        F.explode(
            covering_cells_col(
                F.col("xmin") - e,
                F.col("ymin") - e,
                F.col("xmax") + e,
                F.col("ymax") + e,
                bits=bits,
                region=region,
            )
        ),
    )


def point_range_join(
    points: DataFrame,
    queries: DataFrame,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
    horizon_ms: int | None = None,
    horizon_end_ms: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """points(id, x, y, ts) ⋈ queries(query_id, xmin, ymin, xmax, ymax)
    → (query_id, doc_id) where the point lies in the epsilon-padded rect.

    ``horizon_ms``/``horizon_end_ms`` apply the reference's logical sliding
    window: only points with ``horizon_end - horizon <= ts < horizon_end``
    are indexed (LocalTreePF.java:69,93-103).
    """
    if horizon_ms is not None and horizon_end_ms is not None:
        points = points.filter(
            (F.col("ts") >= F.lit(horizon_end_ms - horizon_ms))
            & (F.col("ts") < F.lit(horizon_end_ms))
        )
    pts = points.withColumn("cell", cell_id_col(F.col("x"), F.col("y"), bits, region))
    q = explode_query_cells(queries, bits, region, eps)
    if broadcast_queries:
        q = F.broadcast(q)
    joined = pts.join(q, "cell").filter(
        rect_contains_point(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col("x"), F.col("y"), eps,
        )
    )
    # A point lives in exactly one cell, so cell routing adds no duplicates;
    # the dropDuplicates is the reference's merge-stage HashSet semantics
    # (QueryResultPF.java:44-48): the answer is a SET of (query, doc) pairs,
    # so id-colliding input rows collapse.  It shuffles only the (small)
    # result, never the doc table.
    return (
        joined.select(F.col("query_id"), F.col("id").alias("doc_id"))
        .dropDuplicates(["query_id", "doc_id"])
    )


def horizon_range_join(
    points: DataFrame,
    queries: DataFrame,
    horizon_windows: int = LOGIC_WINDOW,
    window_ms: int = WINDOW_MS,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """The reference's production query semantics: each window-end answers
    queries over the trailing ``horizon_windows`` tumbling windows of docs
    (LocalTreePF.java:69,93-103 — the logical sliding window that evicts
    docs older than 8 windows).

    Declarative form: a SLIDING event-time window of length
    horizon*window sliding by one window — each matched doc contributes to
    exactly the window-ends that should still "remember" it; no mutable
    index eviction.  ``points.ts`` must be a timestamp column.  Returns
    (win_start, query_id, doc_id) — the per-horizon result SET
    (dropDuplicates = the merge stage's HashSet, QueryResultPF.java:44-48).

    The same plan body is the streaming query in
    streaming/stream_join.py::streaming_horizon_range_join; batch==stream
    parity is asserted by tests/test_streaming.py.
    """
    pts = points.withColumn(
        "cell", cell_id_col(F.col("x"), F.col("y"), bits, region)
    )
    q = F.broadcast(explode_query_cells(queries, bits, region, eps))
    matched = pts.join(q, "cell").filter(
        rect_contains_point(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col("x"), F.col("y"), eps,
        )
    )
    win = F.window(
        F.col("ts"),
        f"{horizon_windows * window_ms // 1000} seconds",
        f"{window_ms // 1000} seconds",
    )
    return (
        matched.withColumn("win", win)
        .select(
            F.col("win.start").alias("win_start"),
            "query_id",
            F.col("id").alias("doc_id"),
        )
        .dropDuplicates(["win_start", "query_id", "doc_id"])
    )


def horizon_range_join_sql(
    points_sql: str,
    queries_sql: str,
    horizon_windows: int = LOGIC_WINDOW,
    window_ms: int = WINDOW_MS,
    eps: float = EPSILON,
) -> str:
    """DuckDB twin: sliding windows are the epoch-aligned window starts
    s = (floor(ts/window) - j) * window for j in 0..horizon-1 (Spark's
    window() alignment with startTime=0)."""
    return f"""
        SELECT DISTINCT
               epoch_ms((CAST(floor(p.ts / {window_ms}) AS BIGINT) - j)
                        * {window_ms}) AS win_start,
               q.query_id, p.id AS doc_id
        FROM ({points_sql}) p,
             ({queries_sql}) q,
             unnest(range(0, {horizon_windows})) AS t(j)
        WHERE p.x >= q.xmin - {eps!r} AND p.x <= q.xmax + {eps!r}
          AND p.y >= q.ymin - {eps!r} AND p.y <= q.ymax + {eps!r}
    """


def multires_range_join(
    points: DataFrame,
    queries: DataFrame,
    fine_bits: int = JOIN_BITS,
    coarse_bits: int = 6,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
    size_threshold: float | None = None,
) -> DataFrame:
    """Two-level routing for mixed query sizes: small rects route at the
    fine resolution (tight candidate pruning), large rects at the coarse one
    (a region-size rect would otherwise explode into ~4^fine_bits covering
    cells).  This is the query-side use of the engine's two-level grid —
    the reference's analog is the GTree answering both leaf-sized and
    multi-leaf queries from one hierarchy (GTree.java:395-407).
    """
    if size_threshold is None:
        size_threshold = 8.0 * region.width / (1 << fine_bits)
    w = F.col("xmax") - F.col("xmin")
    h = F.col("ymax") - F.col("ymin")
    is_small = (w <= F.lit(size_threshold)) & (h <= F.lit(size_threshold))
    small = queries.filter(is_small)
    large = queries.filter(~is_small)
    j_small = point_range_join(points, small, bits=fine_bits, region=region, eps=eps)
    j_large = point_range_join(points, large, bits=coarse_bits, region=region, eps=eps)
    # the two query subsets are disjoint, so the union needs no extra dedup
    return j_small.unionByName(j_large)


def mbr_range_join(
    docs: DataFrame,
    queries: DataFrame,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
    broadcast_queries: bool = True,
) -> DataFrame:
    """docs(id, xmin, ymin, xmax, ymax) ⋈ queries(...) on epsilon-MBR
    intersection (Rectangle.java:280-289).  Docs covering several cells are
    routed once per cell (GlobalTreePF.java:58-63); the final dropDuplicates
    is the reference's merge-stage HashSet dedup (QueryResultPF.java:44-48).
    """
    d = docs.withColumn(
        "cell",
        F.explode(
            covering_cells_col(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
                bits=bits, region=region,
            )
        ),
    ).select("cell", F.col("id").alias("doc_id"),
             F.col("xmin").alias("dxmin"), F.col("ymin").alias("dymin"),
             F.col("xmax").alias("dxmax"), F.col("ymax").alias("dymax"))
    q = explode_query_cells(queries, bits, region, eps)
    if broadcast_queries:
        q = F.broadcast(q)
    joined = d.join(q, "cell").filter(
        rects_intersect(
            F.col("dxmin"), F.col("dymin"), F.col("dxmax"), F.col("dymax"),
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), eps,
        )
    )
    return joined.select("query_id", "doc_id").dropDuplicates(["query_id", "doc_id"])
