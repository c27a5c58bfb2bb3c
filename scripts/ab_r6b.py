"""Round-6 follow-up A/B experiments (session 2), interleaved same-session:

  A. minhash capped_shingles: broadcast-keep semi-join (old) vs
     broadcast-hot anti-join (new) — the keep side is vocabulary-sized,
     the hot side is bounded by n_docs/max_df.
  B. pip_join general path: Arrow batch sizing for the 7M-row refine hop
     (maxRecordsPerBatch 10k default vs 64k + 64m byte bound).

Usage: python scripts/ab_r6b.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from distributed_spatial_index_spark.session import get_spark


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dsi-ab2", cores=cpus, shuffle_partitions=cpus)

    import distributed_spatial_index_spark.operators.dedup as dd
    from distributed_spatial_index_spark.operators.pip_join import (
        pip_join,
        triangle_polygons,
    )
    from distributed_spatial_index_spark.sources import tables as src

    pts = src.geo_points(spark, sf_dir, "lineitem", parallelism=cpus * 2).persist()
    kq = src.knn_queries(spark, sf_dir, "lineitem").persist()
    pts.count(), kq.count()
    _materialize(pts.mapInPandas(lambda it: it, schema=pts.schema))
    docs = src.load(spark, sf_dir, "documents")

    # --- variant A: old capped_shingles (broadcast keep, semi join) --------
    def capped_shingles_old(docs, n=3, text_col="text", max_df=None):
        sh = dd.shingles(docs, n, text_col)
        if max_df is None:
            return sh
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        keep = df_counts.filter(F.col("df") <= max_df).select("shingle")
        return sh.join(F.broadcast(keep), "shingle")

    new_capped = dd.capped_shingles

    def minhash_with(capped):
        dd.capped_shingles = capped
        try:
            return dd.minhash_lsh_pairs(docs, threshold=0.2, max_df=20)
        finally:
            dd.capped_shingles = new_capped

    # --- variant B: arrow batch sizing for pip_join ------------------------
    def pip_thunk():
        return pip_join(pts, triangle_polygons(kq), bits=9, unroll_arity=None)

    def set_arrow(recs, bytes_):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(recs))
        if bytes_:
            spark.conf.set("spark.sql.execution.arrow.maxBytesPerBatch", bytes_)
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxBytesPerBatch")

    results: dict[str, list[float]] = {}

    def timed(name, thunk):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        _materialize(thunk())
        dt = round(time.perf_counter() - t0, 3)
        results.setdefault(name, []).append(dt)
        print(f"  {name:28s} {dt:7.3f}  load1={os.getloadavg()[0]:.1f}",
              flush=True)

    # warmups (both plan shapes pay codegen once)
    _materialize(minhash_with(capped_shingles_old))
    _materialize(minhash_with(new_capped))
    _materialize(pip_thunk())

    for r in range(rounds):
        print(f"round {r}:", flush=True)
        timed("minhash_old_keepbcast", lambda: minhash_with(capped_shingles_old))
        timed("minhash_new_antijoin", lambda: minhash_with(new_capped))
        set_arrow(10000, None)
        timed("pip_arrow_10k", pip_thunk)
        set_arrow(65536, "64m")
        timed("pip_arrow_64k_64m", pip_thunk)
        set_arrow(10000, None)

    print("\nbest:")
    for name, runs in results.items():
        print(f"  {name:28s} best={min(runs):7.3f}  runs={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
