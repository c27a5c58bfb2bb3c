"""Segment former: consecutive trajectory points -> line segments.

Spark re-expression of the reference's stateful flatMap
(ToInputItemFlatMap.java:23-47): per-TID the last point is ALWAYS replaced,
and a segment (prev, cur) is emitted unless it is stationary (both coords
epsilon-equal, Constants.java:173-175) or a jump (either axis delta >
maxSegment=400, Constants.java:24).  That always-replace semantics makes the
batch equivalent a pure lag() window — no keyed state needed (SURVEY.md P2).

The 30-minute TID eviction in the reference only bounds its in-memory map
(it never suppresses a segment, because an evicted TID's next point simply
re-seeds the map); batch recomputation has no map to bound, so no analog is
needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import EPSILON, MAX_SEGMENT


def form_segments(
    points: DataFrame,
    eps: float = EPSILON,
    max_segment: float = MAX_SEGMENT,
) -> DataFrame:
    """points(tid, seq, ts, x, y) -> segments(tid, ts, x1, y1, x2, y2).

    ``seq`` breaks ordering ties deterministically (the reference's input is
    a file read in order; batch needs an explicit total order per tid).
    Segment timestamp = second endpoint's ts (Segment.java:32-34).
    """
    w = Window.partitionBy("tid").orderBy("ts", "seq")
    with_prev = points.select(
        "tid", "ts", "x", "y",
        F.lag("x").over(w).alias("px"),
        F.lag("y").over(w).alias("py"),
    ).filter(F.col("px").isNotNull())
    dx = F.abs(F.col("x") - F.col("px"))
    dy = F.abs(F.col("y") - F.col("py"))
    stationary = (dx < F.lit(eps)) & (dy < F.lit(eps))
    jump = (dx > F.lit(max_segment)) | (dy > F.lit(max_segment))
    return with_prev.filter(~stationary & ~jump).select(
        "tid",
        F.col("ts"),
        F.col("px").alias("x1"), F.col("py").alias("y1"),
        F.col("x").alias("x2"), F.col("y").alias("y2"),
    )


def segments_sql(points_sql: str, eps: float = EPSILON,
                 max_segment: float = MAX_SEGMENT) -> str:
    """DuckDB oracle mirroring form_segments (same lag + filters)."""
    return f"""
        SELECT tid, ts, px AS x1, py AS y1, x AS x2, y AS y2 FROM (
            SELECT tid, ts, x, y,
                   lag(x) OVER (PARTITION BY tid ORDER BY ts, seq) AS px,
                   lag(y) OVER (PARTITION BY tid ORDER BY ts, seq) AS py
            FROM ({points_sql})
        )
        WHERE px IS NOT NULL
          AND NOT (abs(x - px) < {eps!r} AND abs(y - py) < {eps!r})
          AND NOT (abs(x - px) > {max_segment!r} OR abs(y - py) > {max_segment!r})
    """
