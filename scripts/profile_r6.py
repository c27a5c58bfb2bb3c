"""Round-6 profiling harness (guide §1): per-query stage breakdown.

Runs each bench.py query in isolation against $SPARK_GRAFT_SF_DIR with the
Spark UI enabled, then pulls per-stage wall/shuffle/task metrics from the
REST API so the time goes to named operators, not guesses.  Not part of the
measured bench — bench.py is frozen.

Usage: python scripts/profile_r6.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from distributed_spatial_index_spark.session import get_spark


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def stage_report(spark, since_stage: int) -> list[dict]:
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    out = []
    for s in stages:
        if s["stageId"] < since_stage:
            continue
        out.append({
            "id": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s["numCompleteTasks"],
            "ms": s.get("executorRunTime", 0),
            "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
            "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
            "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
            "in_rows": s.get("inputRecords", 0),
            "out_rows": s.get("outputRecords", 0),
            "sh_read_rows": s.get("shuffleReadRecords", 0),
        })
    return sorted(out, key=lambda d: -d["ms"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dsi-profile", cores=cpus,
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "true"})

    from pyspark.sql import functions as F

    from distributed_spatial_index_spark.operators.dedup import minhash_lsh_pairs
    from distributed_spatial_index_spark.operators.density import density_grid
    from distributed_spatial_index_spark.operators.knn import knn
    from distributed_spatial_index_spark.operators.pip_join import (
        convex_pip_join,
        pip_join,
        triangle_polygons,
    )
    from distributed_spatial_index_spark.operators.range_join import (
        mbr_range_join,
        point_range_join,
    )
    from distributed_spatial_index_spark.operators.simsearch import cosine_topk
    from distributed_spatial_index_spark.operators.tiles import assign_tiles
    from distributed_spatial_index_spark.plans.partitioning import (
        hot_cells_from_density,
        salted_point_range_join,
    )
    from distributed_spatial_index_spark.sources import tables as src
    from distributed_spatial_index_spark.sources.spans import extract_geo
    from distributed_spatial_index_spark.sources.synthetic import (
        interleaved_documents,
    )

    pts = src.geo_points(spark, sf_dir, "lineitem", parallelism=cpus * 2).persist()
    qs = src.range_queries(spark, sf_dir, "lineitem").persist()
    upts = src.unique_geo_points(spark, sf_dir, "lineitem",
                                 parallelism=cpus * 2).persist()
    kq = src.knn_queries(spark, sf_dir, "lineitem").persist()
    pts.count(), qs.count(), upts.count(), kq.count()
    _materialize(pts.mapInPandas(lambda it: it, schema=pts.schema))

    hot = hot_cells_from_density(density_grid(pts, bits=9), threshold=170)

    thunks = {
        "range_join": lambda: point_range_join(pts, qs, bits=9),
        "tile_assignment": lambda: assign_tiles(pts),
        "salted_range_join": lambda: salted_point_range_join(
            pts, qs, hot, n_salt=8, bits=9),
        "density_grid": lambda: density_grid(pts),
        "knn": lambda: knn(upts, kq, k=5),
        "pip_join": lambda: pip_join(
            pts, triangle_polygons(kq), bits=9, unroll_arity=None),
        "pip_join_raycast": lambda: pip_join(pts, triangle_polygons(kq), bits=9),
        "pip_join_convex": lambda: convex_pip_join(
            pts, triangle_polygons(kq), bits=9),
        "interleaved_pipeline": lambda: mbr_range_join(
            extract_geo(interleaved_documents(spark, sf_dir)).select(
                F.col("doc_id").cast("long").alias("id"),
                "xmin", "ymin", "xmax", "ymax"),
            src.range_queries(spark, sf_dir, "documents", ratio=15)),
        "minhash_lsh": lambda: minhash_lsh_pairs(
            src.load(spark, sf_dir, "documents"), threshold=0.2, max_df=20),
        "cosine_topk": lambda: cosine_topk(
            src.load(spark, sf_dir, "embeddings"), n_queries=16, k=10),
    }
    names = sys.argv[1:] or list(thunks)
    report = {}
    for name in names:
        thunk = thunks[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        _materialize(thunk())  # warm
        tracker = spark.sparkContext.statusTracker()
        ids = tracker.getActiveStageIds()
        next_stage = 0
        # next stage id = read from the REST API's max + 1
        for s in stage_report(spark, 0):
            next_stage = max(next_stage, s["id"] + 1)
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.perf_counter()
        _materialize(thunk())
        wall = time.perf_counter() - t0
        stages = stage_report(spark, next_stage)
        report[name] = {"wall": round(wall, 3), "stages": stages}
        print(f"\n=== {name}: wall={wall:.3f}s "
              f"(sum stage ms={sum(s['ms'] for s in stages)})")
        for s in stages[:12]:
            print(f"  stage {s['id']:>4} {s['ms']:>7}ms cpu={s['cpu_ms']:>7} "
                  f"tasks={s['tasks']:>3} shR={s['sh_read_mb']:>8}MB "
                  f"shW={s['sh_write_mb']:>8}MB inRows={s['in_rows']:>9} "
                  f"shRRows={s['sh_read_rows']:>9}  {s['name']}")
    out = os.environ.get("SPARK_GRAFT_PROFILE_OUT", "/tmp/profile_r6.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwritten: {out}")
    spark.stop()


if __name__ == "__main__":
    main()
