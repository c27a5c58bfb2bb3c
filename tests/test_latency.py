"""Per-query latency surface (QueryResult.java:12-26 / QueryResultPF.java:
44-51): input stamps where queries enter, output stamps at the merge
boundary, one latency row per answered query — checkpointed like any other
pipeline table."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.latency import (
    result_latency,
    stamp_wallclock,
)
from distributed_spatial_index_spark.operators.range_join import point_range_join
from distributed_spatial_index_spark.sources import tables as src
from distributed_spatial_index_spark.sources.checkpoint import Checkpointer
from tests.conftest import SF_DIR


def test_per_query_latency_rows(spark):
    qs = stamp_wallclock(
        src.range_queries(spark, SF_DIR, "lineitem"), "input_ms"
    )
    joined = point_range_join(
        src.geo_points(spark, SF_DIR, "lineitem"),
        qs.select("query_id", "xmin", "ymin", "xmax", "ymax"),
    )
    lat = result_latency(joined, qs).collect()
    answered = {r["query_id"] for r in joined.select("query_id").distinct().collect()}
    assert {r["query_id"] for r in lat} == answered and len(lat) > 0
    for r in lat:
        assert r["output_ms"] >= r["input_ms"]
        assert r["latency_ms"] == r["output_ms"] - r["input_ms"]
        assert r["n_results"] >= 1


def test_latency_step_checkpoints(spark):
    """The latency table is a first-class checkpoint step: committed once,
    read back on resume, metrics + lineage recorded for it."""
    with tempfile.TemporaryDirectory() as d:
        ck = Checkpointer(spark, d)
        qs = stamp_wallclock(
            src.range_queries(spark, SF_DIR, "lineitem"), "input_ms"
        )
        joined = point_range_join(
            src.geo_points(spark, SF_DIR, "lineitem"),
            qs.select("query_id", "xmin", "ymin", "xmax", "ymax"),
        )
        lat = ck.step(
            "query_latency", lambda: result_latency(joined, qs),
            lineage_key="query_id",
        )
        n = lat.count()
        assert n > 0 and ck.has("query_latency")
        metric_steps = {
            r["step"] for r in ck.metrics().collect()
        }
        assert "query_latency" in metric_steps
        # resume path returns the committed stamps, not a recomputation
        again = ck.step(
            "query_latency",
            lambda: (_ for _ in ()).throw(AssertionError("recomputed")),
            lineage_key="query_id",
        )
        a = sorted(map(tuple, lat.collect()))
        b = sorted(map(tuple, again.collect()))
        assert a == b
