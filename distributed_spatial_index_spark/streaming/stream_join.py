"""Structured Streaming spatial range join + stateful segment former.

The reference is a hand-wired Flink streaming topology: tumbling 60 s
windows at every stage (StreamingJob.java:134...), watermark = max-1 with
zero lateness (InputItemTimeAndWater.java:15-24), per-TID keyed state for
segment forming (ToInputItemFlatMap.java:17).  Spark equivalents:

- range join  -> stream-static inner join (doc stream x broadcast query
  table; stateless, no watermark needed for the join itself) followed by a
  watermarked tumbling-window count per query — the reference's
  QueryResultPF merge stage shape;
- segment former -> applyInPandasWithState keyed by tid, state = last point
  (always replaced, exactly ToInputItemFlatMap.java:38 semantics).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from distributed_spatial_index_spark.config import (
    DEFAULT_REGION,
    EPSILON,
    JOIN_BITS,
    LOGIC_WINDOW,
    MAX_SEGMENT,
    Region,
    WINDOW_MS,
)
from distributed_spatial_index_spark.functions.cells import cell_id_col
from distributed_spatial_index_spark.functions.geometry import rect_contains_point
from distributed_spatial_index_spark.operators.range_join import explode_query_cells


def _cell_matched(
    pts: DataFrame,
    queries: DataFrame,
    bits: int,
    region: Region,
    eps: float,
) -> DataFrame:
    """Shared match-plan core: cell-route ``pts`` (already watermarked for
    streaming callers) against the broadcast exploded query cells and apply
    the epsilon containment refine.  ONE definition feeds both the
    streaming operators and their batch parity twins — the plans cannot
    drift apart, and the independent check stays the DuckDB oracle."""
    pts = pts.withColumn("cell", cell_id_col(F.col("x"), F.col("y"), bits, region))
    q = F.broadcast(explode_query_cells(queries, bits, region, eps))
    return pts.join(q, "cell").filter(
        rect_contains_point(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col("x"), F.col("y"), eps,
        )
    )


def streaming_point_range_join(
    doc_stream: DataFrame,
    queries: DataFrame,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """doc_stream(id, x, y, ts timestamp) x static queries -> per-window
    per-query match counts (append mode, 60 s tumbling, zero lateness —
    the reference's window/watermark configuration)."""
    # watermark on the SOURCE side: every input row advances event time,
    # matched or not (matches the reference assigning watermarks at the
    # source, InputItemTimeAndWater.java / StreamingJob.java:125)
    return batch_windowed_match_counts(
        doc_stream.withWatermark("ts", "0 seconds"), queries, bits, region, eps
    )


def streaming_horizon_range_join(
    doc_stream: DataFrame,
    queries: DataFrame,
    horizon_windows: int = LOGIC_WINDOW,
    window_ms: int = WINDOW_MS,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """The reference's 8-window logical horizon IN the stream
    (LocalTreePF.java:69,93-103): every window-end answers queries over the
    trailing ``horizon_windows`` windows of docs.  Expressed as a SLIDING
    event-time window over the matched stream — a doc stays visible to
    exactly the next ``horizon_windows`` window-ends and then ages out of
    state via the watermark, which IS the reference's eviction, handled by
    Spark's state store instead of a mutable tree.

    Dedup-by-aggregation (groupBy the window + pair, append mode) so state
    eviction is watermark-driven; emits (win_start, query_id, doc_id) —
    per-horizon result SETS, identical to the batch
    operators.range_join.horizon_range_join (parity proven in
    tests/test_streaming.py).
    """
    matched = _cell_matched(
        doc_stream.withWatermark("ts", "0 seconds"), queries, bits, region, eps
    )
    win = F.window(
        F.col("ts"),
        f"{horizon_windows * window_ms // 1000} seconds",
        f"{window_ms // 1000} seconds",
    )
    return (
        matched.groupBy(win.alias("win"), "query_id", F.col("id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(F.col("win.start").alias("win_start"), "query_id", "doc_id")
    )


def batch_windowed_match_counts(
    points: DataFrame,
    queries: DataFrame,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """(win_start, query_id, n_matches) windowed match counts — the ONE
    plan builder behind streaming_point_range_join (which just watermarks
    the input first) and the batch parity target."""
    matched = _cell_matched(points, queries, bits, region, eps)
    return (
        matched
        .groupBy(F.window("ts", f"{WINDOW_MS // 1000} seconds"), "query_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .select(F.col("window.start").alias("win_start"), "query_id", "n_matches")
    )


def streaming_range_join_with_latency(
    doc_stream: DataFrame,
    queries: DataFrame,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """streaming_point_range_join carrying the reference's latency surface
    IN the stream (QueryResult.java:12-26 / QueryResultPF.java:44-51):
    docs are wall-clock-stamped on ingest (arrival time, per Arrow batch),
    each emitted window row is stamped when the watermark releases it, and
    latency_ms = emit - earliest arrival that contributed.  Emits
    (win_start, query_id, n_matches, input_ms, output_ms, latency_ms)."""
    from distributed_spatial_index_spark.operators.latency import (
        stamp_wallclock,
    )

    matched = _cell_matched(
        stamp_wallclock(doc_stream, "input_ms").withWatermark("ts", "0 seconds"),
        queries, bits, region, eps,
    )
    agg = (
        matched
        .groupBy(F.window("ts", f"{WINDOW_MS // 1000} seconds"), "query_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("input_ms").alias("input_ms"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "query_id", "n_matches", "input_ms",
        )
    )
    # stateless stamp AFTER the stateful aggregation: rows pass through
    # here exactly when the watermark finalizes their window (append mode),
    # so output_ms is the true emission time
    stamped = stamp_wallclock(agg, "output_ms")
    return stamped.withColumn(
        "latency_ms", F.col("output_ms") - F.col("input_ms")
    )


def _solver_opaque(cond):
    """Hide a non-time boolean conjunct from Spark's stream-stream
    state-watermark solver.  StreamingJoinHelper walks every top-level
    inequality conjunct of the join condition and, while collecting terms,
    calls ``eval()`` on whatever it takes for the constant side — for a
    conjunct like ``x >= xmin - eps`` that side is an ATTRIBUTE, so every
    micro-batch throws (and logs) a swallowed ``[INTERNAL_ERROR] Cannot
    evaluate expression: xmin#...`` (StreamingJoinHelper.scala:204, the
    per-predicate catch at getStateWatermarkSafely).  Wrapping the conjunct
    as ``array_contains(array(cond), true)`` keeps execution semantics
    identical in filter position (NULL -> NULL -> row dropped) but is not a
    ``<``/``>=`` node, so the solver never looks inside — it analyzes only
    the bare raw-column time bounds, which are exactly the ones it can
    solve.  No optimizer rule re-expands this form back into conjuncts."""
    return F.array_contains(F.array(cond), F.lit(True))


def _stream_stream_matched(
    docs: DataFrame,
    queries: DataFrame,
    horizon_windows: int,
    window_ms: int,
    bits: int,
    region: Region,
    eps: float,
    broadcast_queries: bool,
) -> DataFrame:
    """Shared core of the stream-stream horizon join and its batch twin:
    cell equi-join + epsilon containment + window-aligned horizon bounds
    on (ts, qts).  Callers watermark (streaming) or broadcast (batch)."""
    d = docs.withColumn("cell", cell_id_col(F.col("x"), F.col("y"), bits, region))
    q = explode_query_cells(queries, bits, region, eps)
    if broadcast_queries:
        q = F.broadcast(q)
    lo, hi = _horizon_bounds(F.col("qts"), horizon_windows, window_ms)
    # Redundant RAW-COLUMN time-range bound alongside the window-aligned
    # horizon predicate: win_start(qts) is in (qts - w, qts], so the horizon
    # [lo, hi) implies qts - h*w < ts <= qts + w — adding it never changes
    # the result set.  What it buys: Spark's stream-stream state cleanup
    # only recognizes range conditions on the raw watermarked event-time
    # columns (StreamingJoinHelper canonicalizes `ts <cmp> qts +- literal`),
    # not the derived floor-arithmetic columns — with this bound both sides'
    # join state is evicted as the watermark advances instead of being
    # retained for the whole run (tests/test_streaming.py::
    # test_stream_stream_state_bounded).
    raw_bound = (
        F.col("ts")
        >= F.col("qts") - F.expr(
            f"INTERVAL {horizon_windows * window_ms} MILLISECONDS"
        )
    ) & (
        F.col("ts")
        <= F.col("qts") + F.expr(f"INTERVAL {window_ms} MILLISECONDS")
    )
    # The containment refine and the derived window-aligned bounds are
    # solver-opaque (see _solver_opaque): only the cell key and the raw
    # (ts, qts) bounds remain visible to state-watermark analysis, so the
    # per-micro-batch INTERNAL_ERROR/warning burst is gone and the solver
    # cleanly derives both sides' eviction watermarks from raw_bound.
    return d.join(q, "cell").filter(
        _solver_opaque(
            rect_contains_point(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
                F.col("x"), F.col("y"), eps,
            )
            & (F.col("ts") >= lo) & (F.col("ts") < hi)
        )
        & raw_bound
    )


def _horizon_bounds(qts, horizon_windows: int, window_ms: int):
    """[win_lo, win_hi) covering the ``horizon_windows`` window-aligned
    windows ending with the window containing ``qts`` (epoch-ms floor
    arithmetic, mirrored exactly in the SQL twin)."""
    ms = F.unix_millis(qts)
    win_start = ms - F.pmod(ms, F.lit(window_ms))
    lo = win_start - F.lit((horizon_windows - 1) * window_ms)
    hi = win_start + F.lit(window_ms)
    return F.timestamp_millis(lo), F.timestamp_millis(hi)


def streaming_stream_stream_range_join(
    doc_stream: DataFrame,
    query_stream: DataFrame,
    horizon_windows: int = LOGIC_WINDOW,
    window_ms: int = WINDOW_MS,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """BOTH sides in motion — the reference's actual topology: queries
    arrive in the same replayed stream as the points (ToInputItemFlatMap
    emits both; LocalTreePF.java:93-103 probes the tree holding the
    trailing ``horizon_windows`` window-aligned batches of docs).  Spark
    form: stream-stream INNER join on the point's cell vs the query's
    exploded covering cells (a pair meets in exactly ONE cell — the
    point's — so the join itself emits no cell-duplicates), with the
    window-aligned horizon as a time-range predicate on the two event-time
    columns.

    Both streams carry 0-second watermarks (the reference's max-1, no
    lateness).  The window-aligned horizon bounds are derived columns
    (invisible to Spark's state-cleanup analyzer), so the join ALSO carries
    the implied raw-column bound ``q.qts - h*w <= d.ts <= q.qts + w`` —
    that one IS recognized, so join state on both sides is watermark-evicted
    on unbounded deployments too (test_stream_stream_state_bounded asserts
    ``numRowsTotal`` stops growing across a long replay).

    Emits (query_id, doc_id, qts) match rows in append mode; dedupe
    downstream when doc ids repeat (source-dependent, exactly like the
    batch join's set semantics).
    """
    joined = _stream_stream_matched(
        doc_stream.withWatermark("ts", "0 seconds"),
        query_stream.withWatermark("qts", "0 seconds"),
        horizon_windows, window_ms, bits, region, eps,
        broadcast_queries=False,  # a stream cannot be broadcast
    )
    return joined.select("query_id", F.col("id").alias("doc_id"), "qts")


def batch_stream_stream_twin(
    points: DataFrame,
    queries: DataFrame,
    horizon_windows: int = LOGIC_WINDOW,
    window_ms: int = WINDOW_MS,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """Batch twin of the stream-stream horizon join (points.ts / queries.qts
    as timestamps), distinct (query_id, doc_id) pairs.  Same plan builder
    as the streaming form (_stream_stream_matched) — only the watermarks,
    the broadcast hint, and the dedup differ."""
    return (
        _stream_stream_matched(
            points, queries, horizon_windows, window_ms, bits, region, eps,
            broadcast_queries=True,
        )
        .select("query_id", F.col("id").alias("doc_id"))
        .dropDuplicates(["query_id", "doc_id"])
    )


def stream_stream_join_oracle_sql(
    points_sql: str,
    queries_sql: str,
    horizon_windows: int = LOGIC_WINDOW,
    window_ms: int = WINDOW_MS,
    eps: float = EPSILON,
) -> str:
    """DuckDB twin over the derived tables (ts/qts as epoch millis)."""
    w = window_ms
    return f"""
        SELECT DISTINCT q.query_id, p.id AS doc_id
        FROM ({points_sql}) p, ({queries_sql}) q
        WHERE p.x >= q.xmin - {eps!r} AND p.x <= q.xmax + {eps!r}
          AND p.y >= q.ymin - {eps!r} AND p.y <= q.ymax + {eps!r}
          AND p.ts >= (q.qts - (q.qts % {w})) - {(horizon_windows - 1) * w}
          AND p.ts < (q.qts - (q.qts % {w})) + {w}
    """


_SEG_STATE_SCHEMA = "ts long, x double, y double"
_SEG_OUT_SCHEMA = "tid long, ts long, x1 double, y1 double, x2 double, y2 double"


def _segment_state_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-TID: pair consecutive points, always replacing the stored last
    point; drop stationary/jump segments (ToInputItemFlatMap.java:23-47).
    Vectorized: a shift over the sorted batch, plus the one seam row carried
    in state."""
    import numpy as np

    (tid,) = key
    pdf = pd.concat(list(batches), ignore_index=True).sort_values(["ts", "seq"])
    ts = pdf["ts"].to_numpy(dtype=np.int64)
    xs = pdf["x"].to_numpy(dtype=np.float64)
    ys = pdf["y"].to_numpy(dtype=np.float64)
    if state.exists:
        last_ts, last_x, last_y = state.get
        ts0 = np.concatenate(([last_ts], ts))
        xs0 = np.concatenate(([last_x], xs))
        ys0 = np.concatenate(([last_y], ys))
    else:
        ts0, xs0, ys0 = ts, xs, ys
    if len(ts0) >= 1:
        state.update((int(ts0[-1]), float(xs0[-1]), float(ys0[-1])))
    if len(ts0) < 2:
        yield pd.DataFrame(
            {"tid": pd.Series([], dtype="int64"),
             "ts": pd.Series([], dtype="int64"),
             "x1": pd.Series([], dtype="float64"),
             "y1": pd.Series([], dtype="float64"),
             "x2": pd.Series([], dtype="float64"),
             "y2": pd.Series([], dtype="float64")}
        )
        return
    dx = np.abs(xs0[1:] - xs0[:-1])
    dy = np.abs(ys0[1:] - ys0[:-1])
    keep = ~((dx < EPSILON) & (dy < EPSILON)) & ~(
        (dx > MAX_SEGMENT) | (dy > MAX_SEGMENT)
    )
    yield pd.DataFrame(
        {
            "tid": np.full(int(keep.sum()), tid, dtype=np.int64),
            "ts": ts0[1:][keep],
            "x1": xs0[:-1][keep],
            "y1": ys0[:-1][keep],
            "x2": xs0[1:][keep],
            "y2": ys0[1:][keep],
        }
    )


def streaming_segment_former(point_stream: DataFrame) -> DataFrame:
    """point_stream(tid, seq, ts long, x, y) -> segment stream; keyed state
    holds the last point per tid across micro-batches."""
    return point_stream.groupBy("tid").applyInPandasWithState(
        _segment_state_fn,
        outputStructType=_SEG_OUT_SCHEMA,
        stateStructType=_SEG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
