"""Reproduce + fix the per-micro-batch [INTERNAL_ERROR] burst in the
stream-stream join (r4 verdict "What's wrong" #1).

Spark's StreamingJoinHelper walks every top-level inequality conjunct of a
stream-stream join condition trying to derive state watermarks; conjuncts
over non-time attributes (x vs xmin etc.) make it attempt `eval()` on an
attribute -> throws `Cannot evaluate expression` -> caught + logged EVERY
micro-batch.  This script runs the replay at sf0.001 with log capture and
counts INTERNAL_ERROR lines, for the current operator and for candidate
restructurings.  Usage: python scripts/ss_experiment.py [variant]
"""
from __future__ import annotations

import sys

from pyspark.sql import functions as F

from distributed_spatial_index_spark.session import get_spark
from distributed_spatial_index_spark.sources import tables as src
from distributed_spatial_index_spark.streaming.replay import replay_two_streams
from distributed_spatial_index_spark.streaming import stream_join as sj

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("WARN")
    pts = src.geo_points(spark, SF, "lineitem").withColumn(
        "ts", F.timestamp_millis(F.col("ts"))
    )
    qs = src.range_queries(spark, SF, "lineitem").withColumn(
        "qts", F.timestamp_millis(F.col("qts"))
    )
    out = replay_two_streams(
        spark, pts, qs,
        lambda d, q: sj.streaming_stream_stream_range_join(d, q),
    )
    n = out.select("query_id", "doc_id").dropDuplicates().count()
    print("DISTINCT_PAIRS:", n)
    spark.stop()


if __name__ == "__main__":
    main()
