"""Dissect the pip_join general path: time each component in isolation.

Usage: PYTHONPATH=. python scripts/pip_dissect.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from pyspark.sql import functions as F

from distributed_spatial_index_spark.session import get_spark


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dsi-pipdissect", cores=cpus,
                      shuffle_partitions=cpus)

    from distributed_spatial_index_spark.config import DEFAULT_REGION, JOIN_BITS
    from distributed_spatial_index_spark.functions.cells import cell_id_col
    from distributed_spatial_index_spark.operators import pip_join as pj
    from distributed_spatial_index_spark.sources import tables as src

    region = DEFAULT_REGION
    bits = 9
    pts0 = src.geo_points(spark, sf_dir, "lineitem", parallelism=cpus * 2).persist()
    kq = src.knn_queries(spark, sf_dir, "lineitem").persist()
    pts0.count(), kq.count()
    _materialize(pts0.mapInPandas(lambda it: it, schema=pts0.schema))
    polygons = pj.triangle_polygons(kq)

    poly_rows = polygons.select("query_id", "vertices").collect()
    polys = {
        r["query_id"]: np.array([(v["x"], v["y"]) for v in r["vertices"]])
        for r in poly_rows
    }
    bc = spark.sparkContext.broadcast(polys)
    qcells = pj._classified_query_cells_df(
        polygons, bc, bits, region
    ).localCheckpoint(eager=False)
    qc_int = qcells.filter(F.col("interior")).drop("interior")
    qc_bnd = qcells.filter(~F.col("interior")).drop("interior")
    pts = pts0.withColumn(
        "cell", cell_id_col(F.col("x"), F.col("y"), bits, region))
    in_region = (
        (F.col("x") >= F.lit(region.x_lo)) & (F.col("x") <= F.lit(region.x_hi))
        & (F.col("y") >= F.lit(region.y_lo)) & (F.col("y") <= F.lit(region.y_hi))
    )
    bbox = (
        (F.col("x") >= F.col("xmin")) & (F.col("x") <= F.col("xmax"))
        & (F.col("y") >= F.col("ymin")) & (F.col("y") <= F.col("ymax"))
    )
    direct = (
        pts.join(F.broadcast(qc_int), "cell")
        .filter(in_region)
        .select("query_id", F.col("id").alias("doc_id"))
    )
    refine_cols = ["query_id", F.col("id").alias("doc_id"), "x", "y"]
    boundary = (
        pts.join(F.broadcast(qc_bnd), "cell")
        .filter(bbox)
        .select(*refine_cols)
        .unionByName(
            pts.join(F.broadcast(qc_int), "cell")
            .filter(~in_region & bbox)
            .select(*refine_cols)
        )
    )

    def refine(batches):
        qids_sorted, nv, verts = pj._pad_polys(bc.value)
        for pdf in batches:
            if pdf.empty:
                continue
            px = pdf["x"].to_numpy()
            py = pdf["y"].to_numpy()
            qi = pj._poly_index_np(qids_sorted, pdf["query_id"].to_numpy())
            inside = pj._batched_even_odd(px, py, qi, nv, verts)
            yield pdf.loc[inside, ["query_id", "doc_id"]]

    refined = boundary.mapInPandas(refine, schema="query_id long, doc_id long")
    full = direct.unionByName(refined).dropDuplicates(["query_id", "doc_id"])

    def passthrough(batches):
        for pdf in batches:
            yield pdf[["query_id", "doc_id"]]

    arrow_only = boundary.mapInPandas(
        passthrough, schema="query_id long, doc_id long")

    variants = {
        "full": lambda: full,
        "direct_only": lambda: direct,
        "boundary_nopython": lambda: boundary,
        "boundary_arrow_passthru": lambda: arrow_only,
        "boundary_refined": lambda: refined,
        "no_dedup_union": lambda: direct.unionByName(refined),
    }
    results: dict[str, list[float]] = {}
    for v in variants.values():
        _materialize(v())  # warm codegen
    for r in range(rounds):
        print(f"round {r}:", flush=True)
        for name, v in variants.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            _materialize(v())
            dt = round(time.perf_counter() - t0, 3)
            results.setdefault(name, []).append(dt)
            print(f"  {name:26s} {dt:7.3f}  load1={os.getloadavg()[0]:.1f}",
                  flush=True)
    print("\nbest:")
    for name, runs in results.items():
        print(f"  {name:26s} best={min(runs):7.3f}  runs={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
