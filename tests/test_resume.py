"""Checkpoint -> kill -> resume -> identical results (FIXTURES.md §7)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.range_join import point_range_join
from distributed_spatial_index_spark.sources import tables as src
from distributed_spatial_index_spark.sources.checkpoint import Checkpointer
from tests.conftest import SF_DIR


def _pipeline(spark, ck, calls):
    pts = ck.step("points", lambda: (
        calls.append("points"),
        src.geo_points(spark, SF_DIR, "lineitem"),
    )[1], lineage_key="id")
    qs = ck.step("queries", lambda: (
        calls.append("queries"),
        src.range_queries(spark, SF_DIR, "lineitem"),
    )[1], lineage_key="query_id")
    return ck.step("join", lambda: (
        calls.append("join"),
        point_range_join(pts, qs),
    )[1], lineage_key="query_id")


def test_resume_skips_committed_steps(spark):
    with tempfile.TemporaryDirectory() as root:
        calls: list[str] = []
        ck = Checkpointer(spark, root)
        full = sorted(map(tuple, _pipeline(spark, ck, calls).collect()))
        assert calls == ["points", "queries", "join"]

        # simulate a crash after the first two steps: wipe only the join step
        import shutil, os
        shutil.rmtree(os.path.join(root, "steps", "join"))

        calls2: list[str] = []
        ck2 = Checkpointer(spark, root)
        resumed = sorted(map(tuple, _pipeline(spark, ck2, calls2).collect()))
        assert calls2 == ["join"]  # points/queries resumed from snapshot
        assert resumed == full


def test_uncommitted_step_is_recomputed(spark):
    with tempfile.TemporaryDirectory() as root:
        ck = Checkpointer(spark, root)
        calls: list[str] = []
        _pipeline(spark, ck, calls)
        # remove only the commit marker -> step must re-run
        import os
        os.remove(os.path.join(root, "steps", "points", "_COMMITTED"))
        calls2: list[str] = []
        ck2 = Checkpointer(spark, root)
        _pipeline(spark, ck2, calls2)
        assert calls2 == ["points"]


def test_pipeline_records_knn_stats_metrics(spark):
    """jobs/run_pipeline.py promotes knn's per-call health counters into
    the checkpointed metrics table: a fallback/straggler drift is then
    visible in the production artifact, not only in driver logs."""
    import jobs.run_pipeline as pipeline

    with tempfile.TemporaryDirectory() as root:
        pipeline.main(
            ["--data", "/root/testdata/sf0.001", "--out", root], stop=False
        )
        ck = Checkpointer(spark, root)
        m = {(r["step"], r["metric"]): r["value"] for r in ck.metrics().collect()}
        assert ("knn", "rounds_run") in m and m[("knn", "rounds_run")] >= 1
        assert m[("knn", "stragglers")] == 0.0
        assert m[("knn", "fallback_used")] == 0.0
        assert m[("knn", "n_rows")] > 0  # the step itself committed


def test_metrics_and_lineage_tables(spark):
    with tempfile.TemporaryDirectory() as root:
        ck = Checkpointer(spark, root)
        calls: list[str] = []
        res = _pipeline(spark, ck, calls)
        n = res.count()

        m = {(r["step"], r["metric"]): r["value"] for r in ck.metrics().collect()}
        assert m[("join", "n_rows")] == n
        assert m[("points", "wall_sec")] > 0

        lin = ck.lineage("points")
        rows = lin.collect()
        assert sum(r["n_rows"] for r in rows) == 6000
        assert all(r["step"] == "points" for r in rows)
        assert all(
            r["key_min"] is not None and r["key_min"] <= r["key_max"] for r in rows
        )

        # resume records a 'resumed' metric
        ck2 = Checkpointer(spark, root)
        _pipeline(spark, ck2, [])
        m2 = ck2.metrics().filter(F.col("metric") == "resumed").count()
        assert m2 == 3

def test_pipeline_lands_bucketed_centers(spark):
    """The pipeline lands the serving layout (centers bucketed on the
    routing cell) and records its row/bucket counts in the metrics table;
    the landed table must carry the full centers row count and the
    recorded bucket spec."""
    import jobs.run_pipeline as pipeline

    with tempfile.TemporaryDirectory() as root:
        try:
            pipeline.main(
                ["--data", "/root/testdata/sf0.001", "--out", root,
                 "--partitions", "4"],
                stop=False,
            )
            ck = Checkpointer(spark, root)
            m = {(r["step"], r["metric"]): r["value"]
                 for r in ck.metrics().collect()}
            n = m[("bucketed_centers", "n_rows")]
            assert n > 0 and m[("bucketed_centers", "n_buckets")] == 4.0
            assert spark.table("dsi_bucketed_centers").count() == n
            props = {
                r["key"]: r["value"]
                for r in spark.sql(
                    "SHOW TBLPROPERTIES dsi_bucketed_centers"
                ).collect()
            }
            assert props["dsi.n_buckets"] == "4"
        finally:
            spark.sql("DROP TABLE IF EXISTS dsi_bucketed_centers")
