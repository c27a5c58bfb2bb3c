"""spark-submit entry point for the full spatial pipeline.

Usage (local sandbox):
    spark-submit --py-files engine.zip jobs/run_pipeline.py \
        --data /root/testdata/sf0.01 --out /tmp/dsi_out

    # build engine.zip:
    #   cd /root/repo && zip -qr engine.zip distributed_spatial_index_spark

On a cluster, drop the master override (let spark-submit decide) and point
--out at object storage; the checkpoint layer gives resume-on-rerun.

Pipeline: interleaved documents -> media-span MBR extraction -> density ->
two-level grid partition map -> spatial range join + tile assignment ->
results + metrics + per-partition lineage tables under --out, every stage a
resumable checkpoint step.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python jobs/run_pipeline.py` straight from a checkout (spark-submit
# deployments ship the package via --py-files engine.zip instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, stop: bool = True) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/dsi_out")
    ap.add_argument("--partitions", type=int, default=16)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = SparkSession.builder.appName("dsi-pipeline")
    if not os.environ.get("SPARK_SUBMIT_DEPLOY"):  # sandbox default
        builder = builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from distributed_spatial_index_spark.operators.density import (
        density_grid,
        density_matrix,
    )
    from distributed_spatial_index_spark.operators.range_join import mbr_range_join
    from distributed_spatial_index_spark.operators.tiles import assign_tiles
    from distributed_spatial_index_spark.plans.grid import build_grid_index
    from distributed_spatial_index_spark.plans.partitioning import grid_repartition
    from distributed_spatial_index_spark.sources import tables as src
    from distributed_spatial_index_spark.sources.checkpoint import Checkpointer
    from distributed_spatial_index_spark.sources.spans import extract_geo
    from distributed_spatial_index_spark.sources.synthetic import (
        interleaved_documents,
    )

    ck = Checkpointer(spark, args.out)

    docs = ck.step(
        "interleaved_docs", lambda: interleaved_documents(spark, args.data)
    )
    geo = ck.step("span_geo", lambda: extract_geo(docs), lineage_key="offset")

    # density -> two-level grid -> co-located layout
    centers = geo.select(
        F.col("doc_id").cast("long").alias("id"),
        ((F.col("xmin") + F.col("xmax")) / 2).alias("x"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("y"),
    )
    dens = density_grid(centers, bits=7)
    grid = build_grid_index(density_matrix(dens, bits=7), args.partitions, bits=7)
    placed = ck.step(
        "placed", lambda: grid_repartition(centers, grid), lineage_key="pid"
    )

    from distributed_spatial_index_spark.operators.latency import (
        result_latency,
        stamp_wallclock,
    )

    # input stamp where queries enter the pipeline (QueryResult.java:12-26):
    # committed as its OWN checkpoint step so input_ms is written to storage
    # BEFORE the join runs — result_latency then measures real elapsed time
    # since arrival, not just the latency job's own evaluation.
    qs = ck.step(
        "queries_stamped",
        lambda: stamp_wallclock(
            src.range_queries(spark, args.data, "documents", ratio=15),
            "input_ms",
        ),
        lineage_key="query_id",
    )
    joined = ck.step(
        "range_join",
        lambda: mbr_range_join(
            geo.select(F.col("doc_id").cast("long").alias("id"),
                       "xmin", "ymin", "xmax", "ymax"),
            qs.select("query_id", "xmin", "ymin", "xmax", "ymax"),
        ),
        lineage_key="query_id",
    )
    latency = ck.step(
        "query_latency",
        lambda: result_latency(joined, qs),
        lineage_key="query_id",
    )
    tiles = ck.step(
        "tiles", lambda: assign_tiles(centers), lineage_key="tile_id"
    )

    # kNN over the span centers, with the ring search's health counters
    # promoted to the metrics table: a production run that drifted into the
    # brute-force fallback (or was one round from raising) is visible in
    # the artifact, not just in driver logs.
    from distributed_spatial_index_spark.operators.knn import knn

    def _knn_step():
        qk = (
            qs.select("query_id",
                      ((F.col("xmin") + F.col("xmax")) / 2).alias("x"),
                      ((F.col("ymin") + F.col("ymax")) / 2).alias("y"))
        )
        out = knn(centers.dropDuplicates(["id"]), qk, k=5)
        for m, v in out.knn_stats.items():
            ck.record_metric("knn", m, float(v))
        return out

    nn = ck.step("knn", _knn_step, lineage_key="query_id")

    # Land the serving layout: the centers table bucketed on the routing
    # cell (plans/bucketing.py).  The in-pipeline join above broadcasts its
    # (small) query batch — the right plan at that size; this landed table
    # is what recurring LARGE query batches join against downstream with
    # zero doc-side shuffle (the ingest repartition here IS that shuffle,
    # paid once).  The overwrite is idempotent, so resume just re-lands it.
    from distributed_spatial_index_spark.plans.bucketing import (
        write_bucketed_points,
    )

    write_bucketed_points(
        centers, "dsi_bucketed_centers", f"{args.out}/bucketed_centers",
        n_buckets=args.partitions,
    )
    n_bucket_rows = spark.table("dsi_bucketed_centers").count()
    ck.record_metric("bucketed_centers", "n_rows", float(n_bucket_rows))
    ck.record_metric(
        "bucketed_centers", "n_buckets", float(args.partitions)
    )

    print("range_join rows:", joined.count())
    print("per-query latency rows:", latency.count())
    print("tile rows:", tiles.count())
    print("knn rows:", nn.count())
    print("metrics:")
    ck.metrics().orderBy("seq").show(60, truncate=False)
    if stop:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
