"""Per-query latency surface.

The reference threads ``inputTime``/``outputTime`` through every result
(QueryResult.java:12-26) and stamps the output time at the merge stage
(QueryResultPF.java:44-51).  Spark-first equivalent: wall-clock stamps are
appended per Arrow batch on the executors (mapInPandas — per-batch is the
Arrow-native grain; a per-row Python stamp would serialize the hot path for
timestamps that differ by microseconds), once where queries enter the plan
and once where results leave the merge, then aggregated per query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def stamp_wallclock(df: DataFrame, col_name: str) -> DataFrame:
    """Append executor wall-clock epoch-millis, stamped per Arrow batch."""
    # copy the field list: df.schema is cached by PySpark and .add mutates
    schema = StructType(
        list(df.schema.fields) + [StructField(col_name, LongType())]
    )

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            pdf = pdf.copy()
            pdf[col_name] = int(time.time() * 1000)
            yield pdf

    return df.mapInPandas(stamp, schema=schema)


def result_latency(result: DataFrame, stamped_queries: DataFrame) -> DataFrame:
    """result(query_id, ...) x queries(query_id, input_ms) ->
    (query_id, n_results, input_ms, output_ms, latency_ms): one row per
    query that produced results, output time stamped at the merge boundary.
    """
    stamped = stamp_wallclock(
        result.join(
            F.broadcast(stamped_queries.select("query_id", "input_ms")),
            "query_id",
        ),
        "output_ms",
    )
    return (
        stamped.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_results"),
            F.min("input_ms").alias("input_ms"),
            F.max("output_ms").alias("output_ms"),
        )
        .withColumn("latency_ms", F.col("output_ms") - F.col("input_ms"))
    )
