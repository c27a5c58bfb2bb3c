"""Round-6 A/B timing harness: best-of-N per named bench query, noop sink.

Usage: python scripts/ab_r6.py [-n RUNS] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

from distributed_spatial_index_spark.session import get_spark


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dsi-ab", cores=cpus, shuffle_partitions=cpus)

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
    names = args or list(thunks)
    out = {}
    for name in names:
        thunk = thunks[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        _materialize(thunk())
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"run{i}:{name}")
            t0 = time.perf_counter()
            _materialize(thunk())
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(samples), "runs": samples,
                     "load1": round(os.getloadavg()[0], 1)}
        print(f"{name:24s} best={min(samples):7.3f}  runs={samples} "
              f"load1={out[name]['load1']}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
