"""Streaming ingest into the landed layout: after a chunked replay lands
through foreachBatch (INSERT INTO + incremental manifest per batch), the
table must serve every landed reader — bucketed join, pruned join,
knn_landed — with NO staleness error and batch-exact results."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.range_join import point_range_join
from distributed_spatial_index_spark.plans.bucketing import (
    bucketed_point_range_join,
    count_exchanges,
    pruned_bucketed_point_range_join,
    write_bucketed_query_cells,
)
from distributed_spatial_index_spark.sources import tables as src
from distributed_spatial_index_spark.streaming.land import stream_land_points
from tests.conftest import SF_DIR


def _chunked_stream(spark, pts, d, n_chunks=3):
    pdf = pts.orderBy("id").toPandas()
    size = len(pdf) // n_chunks
    for i in range(n_chunks):
        chunk = pdf.iloc[i * size: None if i == n_chunks - 1 else (i + 1) * size]
        spark.createDataFrame(chunk, schema=pts.schema).coalesce(1).write.mode(
            "overwrite").parquet(f"{d}/in/chunk{i}")
    return spark.readStream.schema(pts.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{d}/in/chunk*/")


def test_stream_landed_table_serves_all_landed_readers(spark):
    from distributed_spatial_index_spark.operators.knn import knn, knn_landed

    pts = src.unique_geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    kq = src.knn_queries(spark, SF_DIR, "lineitem").limit(10)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        with tempfile.TemporaryDirectory() as d:
            q = stream_land_points(
                _chunked_stream(spark, pts, d), "t_land_pts", f"{d}/pts",
                f"{d}/ckpt", n_buckets=4, coarse_bits=2,
            )
            q.awaitTermination(300)
            assert not q.isActive and q.exception() is None

            write_bucketed_query_cells(qs, "t_land_qc", f"{d}/qc", n_buckets=4)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

            # every landed reader serves the stream-landed table, fresh
            out = bucketed_point_range_join(spark, "t_land_pts", "t_land_qc")
            assert count_exchanges(out) == 1
            got = sorted(map(tuple, out.collect()))
            expect = sorted(map(tuple, point_range_join(pts, qs).collect()))
            assert got == expect and len(got) > 0

            sel = pruned_bucketed_point_range_join(
                spark, "t_land_pts", "t_land_qc"
            )
            assert sel.prune_stats["files_total"] > 0  # manifest fresh
            assert sorted(map(tuple, sel.collect())) == got

            a = sorted(map(tuple, knn(pts, kq, k=3).collect()))
            b = sorted(map(tuple, knn_landed(
                spark, "t_land_pts", kq, k=3).collect()))
            assert a == b and len(a) > 0

            # compaction pays down the stream's file-count debt: fewer
            # files, same spec, same answers, fresh manifest — and the
            # landed readers keep working on the swapped table
            from distributed_spatial_index_spark.plans.bucketing import (
                compact_bucketed_table,
            )

            before, after = compact_bucketed_table(
                spark, "t_land_pts", f"{d}/pts_compact"
            )
            assert after < before, (before, after)
            out2 = bucketed_point_range_join(spark, "t_land_pts", "t_land_qc")
            assert count_exchanges(out2) == 1
            assert sorted(map(tuple, out2.collect())) == got
            sel2 = pruned_bucketed_point_range_join(
                spark, "t_land_pts", "t_land_qc"
            )
            assert sel2.prune_stats["files_total"] == after
            assert sorted(map(tuple, knn_landed(
                spark, "t_land_pts", kq, k=3).collect())) == a

            # restart against a different layout refuses loudly instead
            # of appending wrong cells (message surfaces through the
            # StreamingQueryException chain)
            more = _chunked_stream(spark, pts.limit(10), f"{d}/again", 1)
            q2 = stream_land_points(
                more, "t_land_pts", f"{d}/pts", f"{d}/ckpt2",
                n_buckets=4, coarse_bits=3,
            )
            with pytest.raises(Exception, match="different layout"):
                q2.awaitTermination(120)
                if q2.exception() is not None:
                    raise q2.exception()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_land_pts")
        spark.sql("DROP TABLE IF EXISTS t_land_qc")
