"""functions/local_rel.py: driver-held small relations as pure-JVM
literal plans — value-identical to createDataFrame, no Python-backed
RDD in the executed plan (the per-action worker-round-trip cost the
round-5 job-count audit measured), with the documented fallbacks."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_spatial_index_spark.functions.local_rel import jvm_local_df
from distributed_spatial_index_spark.plans.bucketing import physical_plan_str


def test_jvm_local_df_matches_createdataframe_and_stays_jvm_side(spark):
    rows = [(1, 10, "a"), (2, None, "b"), (3, 30, None)]
    schema = "k long, v int, s string"
    got = jvm_local_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    # dtypes match; nullability may be TIGHTER (non-nullable where no
    # literal is None) — correct metadata, relaxed by unions as needed
    assert got.dtypes == want.dtypes
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # the point of the helper: no Python-partition-backed scan anywhere
    assert "ExistingRDD" not in physical_plan_str(got)
    # broadcast-side usage (the hot-cell / IVF-pair pattern)
    big = spark.range(100).withColumn("k", F.col("id") % 5)
    j = big.join(F.broadcast(got), "k")
    assert j.count() == 60  # k in {1,2,3} x 20 ids each


def test_jvm_local_df_empty_and_fallback(spark):
    empty = jvm_local_df(spark, [], "k long, s string")
    assert empty.count() == 0
    assert empty.dtypes == spark.createDataFrame([], "k long, s string").dtypes
    assert "ExistingRDD" not in physical_plan_str(empty)

    # above the literal cap the helper deliberately falls back to
    # createDataFrame (analysis cost of a huge literal array)
    rows = [(i,) for i in range(50)]
    fb = jvm_local_df(spark, rows, "k long", max_literal_rows=10)
    assert sorted(r["k"] for r in fb.collect()) == list(range(50))
    assert "ExistingRDD" in physical_plan_str(fb)
