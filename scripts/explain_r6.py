"""Dump .explain("formatted") for every bench query to plans/r06/.

Usage: python scripts/explain_r6.py <suffix>   (suffix = before | after)
"""

from __future__ import annotations

import os
import sys

from distributed_spatial_index_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dsi-explain", cores=cpus, shuffle_partitions=cpus)

    from pyspark.sql import functions as F

    from distributed_spatial_index_spark.operators.dedup import minhash_lsh_pairs
    from distributed_spatial_index_spark.operators.density import density_grid
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
    kq = src.knn_queries(spark, sf_dir, "lineitem").persist()
    hot = hot_cells_from_density(density_grid(pts, bits=9), threshold=170)

    frames = {
        "range_join": lambda: point_range_join(pts, qs, bits=9),
        "tile_assignment": lambda: assign_tiles(pts),
        "salted_range_join": lambda: salted_point_range_join(
            pts, qs, hot, n_salt=8, bits=9),
        "density_grid": lambda: density_grid(pts),
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
    os.makedirs("plans/r06", exist_ok=True)
    # knn is a driver loop, not a single frame: dump the round-1 plan shape
    # by running knn and explaining the returned (unioned) frame.
    from distributed_spatial_index_spark.operators.knn import knn

    upts = src.unique_geo_points(spark, sf_dir, "lineitem",
                                 parallelism=cpus * 2).persist()
    kq2 = src.knn_queries(spark, sf_dir, "lineitem")
    frames["knn"] = lambda: knn(upts, kq2, k=5)

    for name, thunk in frames.items():
        df = thunk()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
            f.write(txt)
        print(f"{name}: {txt.count('Exchange')} Exchange, "
              f"{txt.count('BatchEvalPython')} BatchEvalPython, "
              f"{txt.count('ArrowEvalPython')} ArrowEvalPython, "
              f"{txt.count('MapInPandas') + txt.count('PythonMapInArrow')} mapIn*, "
              f"{txt.count('SortMergeJoin')} SMJ, "
              f"{txt.count('BroadcastHashJoin')} BHJ")
    spark.stop()


if __name__ == "__main__":
    main()
