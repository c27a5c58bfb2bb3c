"""Deterministic replay harness: run a streaming transform over a bounded
point table and hand back its full output as a batch DataFrame.

This is the engine-level twin of the reference's text-replay smoke runs
(StreamingJob.java:121-127 replays a TSV and eyeballs the printed results):
the input is chunked into time-ordered files, streamed with
``maxFilesPerTrigger=1`` + ``availableNow`` into a memory sink, and the
memory table is returned.  Because every streaming operator here is proven
batch==stream (tests/test_streaming.py), the replay lets the DRIVER GATE
witness that equality too: ``result_diff(batch_op(pts), replay(stream_op,
pts))`` must be empty.

Zero-lateness watermark discipline: chunks are written in event-time order
(the reference's replayed files are time-ordered too), and synthetic
off-region flush rows past the last horizon window advance the watermark so
append mode emits every real window before the stream ends.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from distributed_spatial_index_spark.config import LOGIC_WINDOW, WINDOW_MS


def _default_flush_row(schema, flush_ts):
    """One off-region watermark-advancing row for an arbitrary watermarked
    schema: the event-time (timestamp) column gets ``flush_ts``; numeric
    columns get off-region sentinels (-1 for ids, -1e6 for coordinates so
    the row can never match a query cell); everything else NULL.  Callers
    with a different contract pass ``flush_row_factory`` explicitly."""
    row = {}
    stamped = False
    for f in schema.fields:
        t = f.dataType.typeName()
        if t in ("timestamp", "timestamp_ntz"):
            row[f.name] = flush_ts.to_pydatetime()
            stamped = True
        elif t in ("long", "integer", "short", "byte"):
            row[f.name] = -1
        elif t == "double" or t == "float":
            row[f.name] = -1e6
        else:
            row[f.name] = None
    if not stamped:
        # a NULL event-time row would never advance the watermark — the
        # replay would hang to TimeoutError with no hint why; fail now
        raise ValueError(
            f"flush row needs a timestamp column to advance the watermark; "
            f"schema has none: {schema.simpleString()}"
        )
    return row


def replay_stream(
    spark: SparkSession,
    pts: DataFrame,
    transform,
    n_chunks: int = 3,
    flush_windows: int = LOGIC_WINDOW + 2,
    timeout_sec: int = 300,
    sort_cols: tuple[str, ...] = ("ts", "id"),
    flush: bool = True,
    flush_row_factory=None,
    ts_col: str = "ts",
    progress_out: list | None = None,
) -> DataFrame:
    """pts -> batch DataFrame of ``transform(stream over pts)``.

    ``transform`` maps a streaming DataFrame with pts' schema to the
    streaming query to run.  The result is the fully-materialized memory
    sink; the chunk directory is deleted before returning (the memory sink
    holds the rows).  Driver-side pandas staging is gate-scale machinery —
    at production scale the stream source is real (files/Kafka) and this
    helper is only the parity-witness harness.

    ``flush=True`` (watermarked window aggregations) appends two off-region
    rows past the last horizon window so append mode emits every real
    window before the stream ends.  The flush row is derived from
    ``pts.schema`` (timestamp column = flush time, numeric columns =
    off-region sentinels) — pass ``flush_row_factory(schema, flush_ts) ->
    dict`` for streams whose sentinel contract differs.  Pass
    ``flush=False`` for keyed-state transforms (applyInPandasWithState
    with NoTimeout) that emit per micro-batch and need no watermark push.

    ``progress_out``: a caller-provided list that receives the query's
    ``recentProgress`` entries after termination (state-store metrics for
    the state-bound tests and the streaming bench row).
    """
    d = tempfile.mkdtemp(prefix="dsi_replay_")
    name = f"replay_{uuid.uuid4().hex[:12]}"
    make_row = flush_row_factory or _default_flush_row
    try:
        _write_chunks(spark, pts, d, sort_cols, n_chunks)
        # two off-region flush rows past the last horizon window: the first
        # advances the watermark over all real windows, the second flushes
        # the window containing the first (its own never emits — it is empty)
        if flush:
            max_ts = pts.agg({ts_col: "max"}).collect()[0][0]
            for j in range(2):
                flush_ts = (
                    pd.Timestamp(max_ts)
                    + (flush_windows + j) * pd.Timedelta(milliseconds=WINDOW_MS)
                )
                from distributed_spatial_index_spark.functions.local_rel import (
                    jvm_local_df,
                )

                r = make_row(pts.schema, flush_ts)
                if isinstance(r, dict):
                    r = tuple(r.get(f.name) for f in pts.schema.fields)
                # literal plan, not createDataFrame: these two writes sit
                # inside the TIMED replay, and a Python-backed one-row
                # frame under coalesce(1) pays a worker round-trip per
                # partition (functions/local_rel.py)
                fdf = jvm_local_df(spark, [r], pts.schema).select(
                    *pts.columns
                )
                fdf.coalesce(1).write.mode("overwrite").parquet(
                    f"{d}/chunk{n_chunks + j:03d}"
                )
                _pin_mtime(f"{d}/chunk{n_chunks + j:03d}", n_chunks + j)
        stream = (
            spark.readStream.schema(pts.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/chunk*/")
        )
        q = (
            transform(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"replay stream {name} did not finish")
        if progress_out is not None:
            progress_out.extend(q.recentProgress)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name)


def _pin_mtime(chunk_dir: str, seq: int) -> None:
    """Give every file in the chunk dir a strictly increasing mtime: the
    file source orders files by modification time, and chunk writes can
    land within one clock tick — a misordered replay would turn the
    zero-lateness watermark into silent row drops."""
    t = 1_000_000_000 + seq * 10
    for f in glob.glob(os.path.join(chunk_dir, "*")):
        os.utime(f, (t, t))


def _write_chunks(
    spark: SparkSession, df: DataFrame, base: str,
    sort_cols: tuple[str, ...], n_chunks: int,
) -> None:
    """Stage the replay chunks with pyarrow directly — no Spark write
    jobs: the staging sits INSIDE the timed replay window, and the
    previous per-chunk createDataFrame(pandas).coalesce(1).write jobs
    cost ~6 s at the bench's 60k-doc slice vs well under a second
    written in-process.  Timestamps coerce to micros (Spark's parquet
    unit; the sources here are millis-derived, so the coercion is
    exact)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    pdf = df.orderBy(*sort_cols).toPandas()
    if len(pdf) == 0:
        raise ValueError("replay needs non-empty input")
    chunk = max(len(pdf) // n_chunks, 1)
    # the EXPLICIT arrow schema is load-bearing: toPandas upcasts a
    # nullable long to float64, and an inferred from_pandas would stage
    # parquet DOUBLE that the declared-schema stream read then rejects
    # (PARQUET_COLUMN_DATA_TYPE_MISMATCH); the Spark-derived schema
    # converts NaN-as-null back to int64 and naive ns to micros-UTC,
    # exactly what createDataFrame(pdf, df.schema) used to reconcile
    table = pa.Table.from_pandas(
        pdf, schema=to_arrow_schema(df.schema), preserve_index=False
    )
    for i in range(n_chunks):
        lo = i * chunk
        n = (len(table) - lo) if i == n_chunks - 1 else chunk
        cdir = f"{base}/chunk{i:03d}"
        os.makedirs(cdir, exist_ok=True)
        pq.write_table(
            table.slice(lo, n),
            f"{cdir}/part-00000.parquet",
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        _pin_mtime(cdir, i)


def replay_two_streams(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    transform,
    sort_left: tuple[str, ...] = ("ts", "id"),
    sort_right: tuple[str, ...] = ("qts", "query_id"),
    n_chunks: int = 3,
    timeout_sec: int = 300,
    progress_out: list | None = None,
) -> DataFrame:
    """Two-source replay for stream-stream operators: each input is chunked
    time-ordered into its own file source; ``transform(left_stream,
    right_stream)`` runs with availableNow into a memory sink.  Because the
    global watermark is the MINIMUM over both sources and each source
    replays in event-time order, no row is ever late relative to it — the
    zero-lateness policy drops nothing on a faithful replay."""
    d = tempfile.mkdtemp(prefix="dsi_replay2_")
    name = f"replay2_{uuid.uuid4().hex[:12]}"
    try:
        _write_chunks(spark, left, f"{d}/left", sort_left, n_chunks)
        _write_chunks(spark, right, f"{d}/right", sort_right, n_chunks)
        ls = (
            spark.readStream.schema(left.schema)
            .option("maxFilesPerTrigger", 1).parquet(f"{d}/left/chunk*/")
        )
        rs = (
            spark.readStream.schema(right.schema)
            .option("maxFilesPerTrigger", 1).parquet(f"{d}/right/chunk*/")
        )
        q = (
            transform(ls, rs)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"two-stream replay {name} did not finish")
        if progress_out is not None:
            progress_out.extend(q.recentProgress)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name)
