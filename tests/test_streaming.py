"""Structured Streaming parity: micro-batched streams must reproduce the
batch operators' results exactly."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import WINDOW_MS
from distributed_spatial_index_spark.operators.range_join import point_range_join
from distributed_spatial_index_spark.operators.segments import form_segments
from distributed_spatial_index_spark.sources import tables as src
from distributed_spatial_index_spark.streaming.stream_join import (
    streaming_point_range_join,
    streaming_segment_former,
)
from tests.conftest import SF_DIR


def _run_stream(sdf, name: str):
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_range_join_matches_batch(spark):
    with tempfile.TemporaryDirectory() as d:
        pts = src.geo_points(spark, SF_DIR, "lineitem").withColumn(
            "ts", F.timestamp_millis(F.col("ts"))
        )
        # time-ordered micro-batches: the zero-lateness watermark (the
        # reference's max-1 / no-allowedLateness policy) drops late rows,
        # so an out-of-order replay would legitimately diverge from batch
        pdf = pts.orderBy("ts", "id").toPandas()
        third = len(pdf) // 3
        for i in range(3):
            chunk = pdf.iloc[i * third: None if i == 2 else (i + 1) * third]
            spark.createDataFrame(chunk, schema=pts.schema).coalesce(1).write.mode(
                "overwrite").parquet(f"{d}/pts/chunk{i}")
        # two flush batches advance the watermark past the last real window
        # so append mode emits it (the flush point is off-region: no matches)
        import datetime
        for i, hrs in enumerate([2, 3]):
            flush = spark.createDataFrame(
                [(-1, -1e6, -1e6,
                  datetime.datetime(2016, 11, 1) + datetime.timedelta(hours=hrs))],
                "id long, x double, y double, ts timestamp",
            ).select("id", "x", "y", "ts")
            flush.coalesce(1).write.mode("overwrite").parquet(f"{d}/pts/chunk{3 + i}")
        stream = spark.readStream.schema(pts.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{d}/pts/chunk*/")
        qs = src.range_queries(spark, SF_DIR, "lineitem")

        _run_stream(streaming_point_range_join(stream, qs), "srj")
        got = {
            (r["win_start"], r["query_id"]): r["n_matches"]
            for r in spark.sql("SELECT * FROM srj").collect()
        }

        # batch twin of the stream plan: same join, same windowed count
        # (raw matched rows, not deduped pairs — the stream counts matches)
        from distributed_spatial_index_spark.functions.cells import cell_id_col
        from distributed_spatial_index_spark.functions.geometry import (
            rect_contains_point,
        )
        from distributed_spatial_index_spark.operators.range_join import (
            explode_query_cells,
        )

        bpts = src.geo_points(spark, SF_DIR, "lineitem").withColumn(
            "ts", F.timestamp_millis(F.col("ts"))
        ).withColumn("cell", cell_id_col(F.col("x"), F.col("y"), bits=10))
        batch = (
            bpts.join(F.broadcast(explode_query_cells(qs)), "cell")
            .filter(rect_contains_point(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
                F.col("x"), F.col("y")))
            .groupBy(
                F.window("ts", f"{WINDOW_MS // 1000} seconds").alias("window"),
                "query_id")
            .agg(F.count(F.lit(1)).alias("n_matches"))
            .select(F.col("window.start").alias("win_start"), "query_id",
                    "n_matches")
        )
        expect = {
            (r["win_start"], r["query_id"]): r["n_matches"] for r in batch.collect()
        }
        assert got == expect and len(got) > 0


def test_streaming_horizon_range_join_matches_batch(spark):
    """The 8-window logical horizon (LocalTreePF.java:69,93-103): replaying
    the same docs through the streaming sliding-horizon join must produce
    exactly the batch horizon_range_join's per-window (query, doc) sets."""
    import datetime

    from distributed_spatial_index_spark.operators.range_join import (
        horizon_range_join,
    )
    from distributed_spatial_index_spark.streaming.stream_join import (
        streaming_horizon_range_join,
    )

    with tempfile.TemporaryDirectory() as d:
        pts = src.geo_points(spark, SF_DIR, "lineitem").withColumn(
            "ts", F.timestamp_millis(F.col("ts"))
        )
        pdf = pts.orderBy("ts", "id").toPandas()
        third = len(pdf) // 3
        for i in range(3):
            chunk = pdf.iloc[i * third: None if i == 2 else (i + 1) * third]
            spark.createDataFrame(chunk, schema=pts.schema).coalesce(1).write.mode(
                "overwrite").parquet(f"{d}/pts/chunk{i}")
        # flush rows: advance the watermark past the last horizon window so
        # append mode emits everything (off-region -> no matches)
        for i, hrs in enumerate([4, 5]):
            flush = spark.createDataFrame(
                [(-1, -1e6, -1e6,
                  datetime.datetime(2016, 11, 1) + datetime.timedelta(hours=hrs))],
                "id long, x double, y double, ts timestamp",
            )
            flush.coalesce(1).write.mode("overwrite").parquet(f"{d}/pts/chunk{3 + i}")
        stream = spark.readStream.schema(pts.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{d}/pts/chunk*/")
        qs = src.range_queries(spark, SF_DIR, "lineitem")

        _run_stream(streaming_horizon_range_join(stream, qs), "shrj")
        got = sorted(
            map(tuple, spark.sql(
                "SELECT win_start, query_id, doc_id FROM shrj").collect())
        )
        expect = sorted(map(tuple, horizon_range_join(pts, qs).collect()))
        assert got == expect and len(got) > 0


def test_streaming_latency_surface(spark):
    """Latency stamps survive the stream: arrival-stamped docs, emission-
    stamped window rows, non-negative latency, and the match counts equal
    the unstamped streaming join's."""
    import datetime

    from distributed_spatial_index_spark.streaming.stream_join import (
        streaming_range_join_with_latency,
    )

    with tempfile.TemporaryDirectory() as d:
        pts = src.geo_points(spark, SF_DIR, "lineitem").withColumn(
            "ts", F.timestamp_millis(F.col("ts"))
        )
        pdf = pts.orderBy("ts", "id").toPandas()
        half = len(pdf) // 2
        for i in range(2):
            chunk = pdf.iloc[i * half: None if i == 1 else (i + 1) * half]
            spark.createDataFrame(chunk, schema=pts.schema).coalesce(1).write.mode(
                "overwrite").parquet(f"{d}/pts/chunk{i}")
        flush = spark.createDataFrame(
            [(-1, -1e6, -1e6,
              datetime.datetime(2016, 11, 1) + datetime.timedelta(hours=3))],
            "id long, x double, y double, ts timestamp",
        )
        flush.coalesce(1).write.mode("overwrite").parquet(f"{d}/pts/chunk2")
        stream = spark.readStream.schema(pts.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{d}/pts/chunk*/")
        qs = src.range_queries(spark, SF_DIR, "lineitem")

        _run_stream(streaming_range_join_with_latency(stream, qs), "slat")
        rows = spark.sql("SELECT * FROM slat").collect()
        assert len(rows) > 0
        for r in rows:
            assert r["output_ms"] >= r["input_ms"] >= 0
            assert r["latency_ms"] == r["output_ms"] - r["input_ms"]
            assert r["n_matches"] >= 1
        got = {(r["win_start"], r["query_id"]): r["n_matches"] for r in rows}
        _run_stream(streaming_point_range_join(
            spark.readStream.schema(pts.schema).option(
                "maxFilesPerTrigger", 1).parquet(f"{d}/pts/chunk*/"), qs), "splain")
        plain = {
            (r["win_start"], r["query_id"]): r["n_matches"]
            for r in spark.sql("SELECT * FROM splain").collect()
        }
        assert got == plain


def test_streaming_segment_former_matches_batch(spark):
    with tempfile.TemporaryDirectory() as d:
        traj = src.trajectory_points(spark, SF_DIR)
        # order files by time so micro-batches arrive in event order per tid
        traj.withColumn("bucket", (F.col("seq") % 3))
        # split into 3 time-ordered files
        rows = traj.orderBy("ts", "seq")
        rows.coalesce(1).write.mode("overwrite").parquet(f"{d}/all")
        full = spark.read.parquet(f"{d}/all")
        n = full.count()
        third = n // 3
        import pandas as pd
        pdf = full.orderBy("ts", "seq").toPandas()
        os.makedirs(f"{d}/stream", exist_ok=True)
        for i in range(3):
            chunk = pdf.iloc[i * third: None if i == 2 else (i + 1) * third]
            spark.createDataFrame(chunk, schema=full.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{d}/chunk{i}")
        # stream chunks in order
        stream = spark.readStream.schema(full.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{d}/chunk*/")

        _run_stream(streaming_segment_former(stream), "sseg")
        got = sorted(
            map(tuple, spark.sql(
                "SELECT tid, ts, x1, y1, x2, y2 FROM sseg").collect())
        )
        expect = sorted(map(tuple, form_segments(traj).collect()))
        assert got == expect and len(got) > 0

def test_stream_stream_join_matches_batch_and_oracle(spark, ddb):
    """BOTH sides in motion (the reference's real topology): the
    stream-stream horizon join must equal the batch twin and the DuckDB
    twin exactly."""
    from distributed_spatial_index_spark.streaming.replay import (
        replay_two_streams,
    )
    from distributed_spatial_index_spark.streaming.stream_join import (
        batch_stream_stream_twin,
        stream_stream_join_oracle_sql,
        streaming_stream_stream_range_join,
    )

    pts = src.geo_points(spark, SF_DIR, "lineitem").withColumn(
        "ts", F.timestamp_millis(F.col("ts"))
    )
    qs = src.range_queries(spark, SF_DIR, "lineitem").withColumn(
        "qts", F.timestamp_millis(F.col("qts"))
    )
    out = replay_two_streams(
        spark, pts, qs,
        lambda d, q: streaming_stream_stream_range_join(d, q),
    )
    got = sorted({(r["query_id"], r["doc_id"]) for r in out.collect()})
    expect = sorted(
        map(tuple, batch_stream_stream_twin(pts, qs).collect())
    )
    assert got == expect and len(got) > 0
    oracle = sorted(ddb.execute(stream_stream_join_oracle_sql(
        src.geo_points_sql("lineitem"), src.range_queries_sql("lineitem")
    )).fetchall())
    assert got == oracle


def test_stream_stream_state_bounded(spark):
    """The redundant raw-column bound (ts within [qts - h*w, qts + w]) must
    be RECOGNIZED by Spark's stream-stream state cleanup: across a long
    replay, join state rows are evicted as the watermark advances
    (numRowsRemoved > 0) and total state stops growing — without the raw
    bound the derived window-aligned predicate leaves numRowsRemoved == 0
    and numRowsTotal monotonically increasing for the whole run."""
    from distributed_spatial_index_spark.streaming.replay import (
        replay_two_streams,
    )
    from distributed_spatial_index_spark.streaming.stream_join import (
        streaming_stream_stream_range_join,
    )

    pts = src.geo_points(spark, SF_DIR, "lineitem").withColumn(
        "ts", F.timestamp_millis(F.col("ts"))
    )
    qs = src.range_queries(spark, SF_DIR, "lineitem").withColumn(
        "qts", F.timestamp_millis(F.col("qts"))
    )
    progress: list = []
    replay_two_streams(
        spark, pts, qs,
        lambda d, q: streaming_stream_stream_range_join(d, q),
        n_chunks=8, progress_out=progress,
    )
    joins = [
        op for p in progress for op in p["stateOperators"]
        if "symmetricHashJoin" in op.get("operatorName", "")
    ]
    assert joins, f"no join state operator in progress: {progress[:1]}"
    removed = sum(op["numRowsRemoved"] for op in joins)
    totals = [op["numRowsTotal"] for op in joins]
    assert removed > 0, "state cleanup never evicted a row (raw bound lost?)"
    # state peaked before the end: the final retained set is strictly
    # smaller than the high-water mark (watermark-driven eviction), not a
    # monotone accumulation of every input row
    assert totals[-1] < max(totals), totals


def test_streaming_parity_on_rocksdb_state_store(spark):
    """The deployment-scale state store must be drop-in: the default
    HDFS-backed provider keeps ALL state in executor memory (a ceiling a
    100-TB horizon join would hit), RocksDB spills to local disk.  Run the
    horizon join replay under the RocksDB provider and require exact
    batch==stream parity — no extra jars, stock Spark 4."""
    from distributed_spatial_index_spark.operators.compare import result_diff
    from distributed_spatial_index_spark.operators.range_join import (
        horizon_range_join,
    )
    from distributed_spatial_index_spark.streaming.replay import replay_stream
    from distributed_spatial_index_spark.streaming.stream_join import (
        streaming_horizon_range_join,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        pts = src.geo_points(spark, SF_DIR, "lineitem").withColumn(
            "ts", F.timestamp_millis(F.col("ts"))
        )
        qs = src.range_queries(spark, SF_DIR, "lineitem")
        out = replay_stream(
            spark, pts, lambda s: streaming_horizon_range_join(s, qs)
        )
        assert out.count() > 0
        assert result_diff(horizon_range_join(pts, qs), out).count() == 0
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_zero_lateness_drops_late_rows(spark):
    """The reference's max-1/no-allowedLateness policy
    (InputItemTimeAndWater.java:15-24): a row older than the advanced
    watermark must be DROPPED from the windowed aggregation, not merged.

    Spark nuance this test pins down (measured on 4.1): a batch's watermark
    is the one computed at the PREVIOUS batch's end, and a window is
    evicted/emitted at the end of the first batch whose watermark passes
    its end — so a late row arriving in that same batch still merges; the
    hard drop applies to rows arriving once the window's state is gone.
    The replay therefore inserts one batch between the watermark advance
    and the late row."""
    import datetime
    import glob as _glob
    import os as _os
    import tempfile
    import time as _time

    d0 = datetime.datetime(2016, 11, 1)

    def ts(minutes):
        return d0 + datetime.timedelta(minutes=minutes)

    qs = spark.createDataFrame(
        [(1, 100.0, 100.0, 140.0, 140.0)],
        "query_id long, xmin double, ymin double, xmax double, ymax double",
    )
    chunks = [
        # two matches in the same 60s window (t=0s, t=40s)
        [(1, 120.0, 120.0, ts(0)),
         (2, 121.0, 121.0, ts(0) + datetime.timedelta(seconds=40))],
        # advance the watermark far past window [0, 1min)
        [(3, 122.0, 122.0, ts(90))],
        # one more batch: window [0, 1min) is evicted and emitted here
        [(5, 124.0, 124.0, ts(91))],
        # the LATE row back at t=30s — state gone, watermark 91min: DROPPED
        [(4, 123.0, 123.0, ts(0) + datetime.timedelta(seconds=30))],
        # flush so the trailing windows emit
        [(-1, -1e6, -1e6, ts(300))],
    ]
    with tempfile.TemporaryDirectory() as d:
        base = _time.time()
        for i, rows in enumerate(chunks):
            spark.createDataFrame(
                rows, "id long, x double, y double, ts timestamp"
            ).coalesce(1).write.parquet(f"{d}/chunk{i}")
            # the file source orders by modification time; writes land
            # within one mtime tick, so pin strictly increasing mtimes to
            # make the watermark progression deterministic
            for f in _glob.glob(f"{d}/chunk{i}/*"):
                _os.utime(f, (base + 10 * i, base + 10 * i))
        stream = spark.readStream.schema(
            "id long, x double, y double, ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(f"{d}/chunk*/")
        _run_stream(streaming_point_range_join(stream, qs), "slate")
        got = {
            (r["win_start"], r["n_matches"])
            for r in spark.sql("SELECT * FROM slate").collect()
        }
    # late id=4 dropped: the first window stays at 2 and is never re-emitted
    assert got == {(ts(0), 2), (ts(90), 1), (ts(91), 1)}


def test_sessionize_idle_ttl_evicts_state(spark):
    """idle_ttl_minutes: a user idle past the TTL has their sentinel state
    row EVICTED (state bounded by active users, not all-time users); a user
    returning WITHIN the TTL keeps their ordinal; one returning BEYOND it
    restarts at session_id 1 (the documented trade)."""
    import datetime
    import glob as _glob
    import os as _os
    import tempfile
    import time as _time

    from distributed_spatial_index_spark.streaming.sessions import (
        streaming_sessionize,
    )

    d0 = datetime.datetime(2016, 11, 1)

    def ts(minutes):
        return d0 + datetime.timedelta(minutes=minutes)

    # gap=30min, ttl=60min.  u9 is the watermark ticker; u1 returns within
    # its TTL (50 < 0+60); u3 returns after its TTL fired (120 > 60).
    chunks = [
        [(1, 10, ts(0)), (3, 11, ts(0)), (9, 12, ts(0))],
        [(9, 13, ts(40))],
        [(9, 14, ts(45))],   # wm=40: u1/u3 session 1 closes, TTL armed @60
        [(1, 15, ts(50))],   # wm=45: u1 back within TTL -> session_id 2
        [(9, 16, ts(70))],
        [(9, 17, ts(80))],   # wm=70 > 60: u3's idle TTL fires -> row evicted
        [(3, 18, ts(120))],  # state gone -> u3 restarts at session_id 1
        [(-1, -2, ts(300))],
        [(-1, -3, ts(310))],
    ]
    with tempfile.TemporaryDirectory() as d:
        base = _time.time()
        for i, rows in enumerate(chunks):
            spark.createDataFrame(
                rows, "user_id long, event_id long, ts timestamp"
            ).coalesce(1).write.parquet(f"{d}/chunk{i}")
            for f in _glob.glob(f"{d}/chunk{i}/*"):
                _os.utime(f, (base + 10 * i, base + 10 * i))
        stream = spark.readStream.schema(
            "user_id long, event_id long, ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(f"{d}/chunk*/")
        q = _run_stream(
            streaming_sessionize(stream, gap_minutes=30, idle_ttl_minutes=60),
            "sttl",
        )
        progress = list(q.recentProgress)
        rows = spark.sql(
            "SELECT user_id, session_id FROM sttl ORDER BY user_id, start_ts"
        ).collect()
    ids = {}
    for r in rows:
        ids.setdefault(r["user_id"], []).append(r["session_id"])
    assert ids[1] == [1, 2], ids      # within-TTL return keeps ordinals
    assert ids[3] == [1, 1], ids      # beyond-TTL return restarts at 1
    ops = [op for p in progress for op in p["stateOperators"]]
    removed = sum(op["numRowsRemoved"] for op in ops)
    totals = [op["numRowsTotal"] for op in ops]
    assert removed >= 3, (removed, totals)   # u3 (early) + u1 + u9 evicted
    # long-idle rows are gone: final state = the still-open flush user +
    # u3's freshly-closed sentinel, NOT one row per all-time user
    assert totals[-1] <= 2, totals


def test_streaming_sessionize_matches_batch(spark):
    """Gap sessions in-stream (applyInPandasWithState, EventTimeTimeout:
    the state timeout IS the session-gap timer) must reproduce the batch
    lag+cumsum sessionize exactly — ids, counts, and bounds.

    Uses the generic replay harness: the schema-derived flush row (long ->
    -1, timestamp -> flush ts) pushes the watermark past every open
    session's 30-minute gap (flush_windows=40 one-minute windows) so the
    event-time timeouts fire before stream end."""
    from distributed_spatial_index_spark.operators.windows import sessionize
    from distributed_spatial_index_spark.streaming.replay import replay_stream
    from distributed_spatial_index_spark.streaming.sessions import (
        streaming_sessionize,
    )

    ev = src.load(spark, SF_DIR, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = replay_stream(
        spark, ev, lambda s: streaming_sessionize(s, gap_minutes=30),
        sort_cols=("ts", "event_id"), flush_windows=40,
    )
    got = sorted(
        tuple(r) for r in out.filter(F.col("user_id") >= 0).collect()
    )
    expect = sorted(
        map(tuple, sessionize(
            src.load(spark, SF_DIR, "events"), gap_minutes=30
        ).select("user_id", "session_id", "n_events", "start_ts", "end_ts")
        .collect())
    )
    assert got == expect and len(got) > 0


@pytest.mark.slow
def test_stream_stream_state_plateaus_under_load_rocksdb(spark):
    """Load-test of the stream-stream state bound (r4 verdict #7): a 10x
    longer replay (80 chunks vs the 8-chunk eviction test) must show
    numRowsTotal PLATEAUING — the high-water mark is hit in the first
    half and never exceeded in the second — not merely "some rows were
    removed".  Without the raw-column state bound, uniform arrival would
    make second-half state ~2x the first half's.  Runs under the RocksDB
    provider, so the bounded-state claim is witnessed on the
    deployment-scale store, not only the in-memory default."""
    from distributed_spatial_index_spark.streaming.replay import (
        replay_two_streams,
    )
    from distributed_spatial_index_spark.streaming.stream_join import (
        streaming_stream_stream_range_join,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    progress: list = []
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        pts = src.geo_points(spark, SF_DIR, "lineitem").withColumn(
            "ts", F.timestamp_millis(F.col("ts"))
        )
        qs = src.range_queries(spark, SF_DIR, "lineitem").withColumn(
            "qts", F.timestamp_millis(F.col("qts"))
        )
        replay_two_streams(
            spark, pts, qs,
            lambda d, q: streaming_stream_stream_range_join(d, q),
            n_chunks=80, timeout_sec=600, progress_out=progress,
        )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    totals = [
        sum(
            op["numRowsTotal"] for op in p["stateOperators"]
            if "symmetricHashJoin" in op.get("operatorName", "")
        )
        for p in progress
        if p["stateOperators"]
    ]
    assert len(totals) >= 40, f"replay too short for a plateau: {len(totals)}"
    half = len(totals) // 2
    hwm_first, hwm_second = max(totals[:half]), max(totals[half:])
    # plateau, with slack for watermark-lag jitter between batches
    assert hwm_second <= hwm_first * 1.15, (hwm_first, hwm_second, totals)
    assert totals[-1] < hwm_first, totals


def test_replay_stages_nullable_long_columns_exactly(spark):
    """Review regression: toPandas upcasts a nullable long to float64,
    and an INFERRED arrow conversion would stage parquet DOUBLE that the
    declared-schema stream read rejects
    (PARQUET_COLUMN_DATA_TYPE_MISMATCH).  The staging must reconcile to
    the Spark schema — longs with NULLs round-trip exactly."""
    import datetime

    from distributed_spatial_index_spark.streaming.replay import replay_stream

    rows = [
        (i, None if i % 3 == 0 else i * 10,
         datetime.datetime(2020, 1, 1, 0, 0, i))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, v long, ts timestamp")
    out = replay_stream(spark, df, lambda s: s, n_chunks=3, flush=False)
    assert sorted(map(tuple, out.collect())) == sorted(rows)
