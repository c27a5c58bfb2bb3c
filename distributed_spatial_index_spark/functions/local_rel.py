"""Driver-held small relations as pure-JVM local plans.

``spark.createDataFrame(rows)`` backs the relation with a Python RDD of
``defaultParallelism`` partitions, and EVERY action that executes it —
each broadcast build, each coalesce(1) pull, each count — pays one
Python-worker round-trip per partition.  Measured on this sandbox: a
20-row lookup cost 4-8 s per action that way vs 0.1-1 s as the literal
plan built here (BENCH/BASELINE.md round-5 notes; the same pathology
priced the landed-manifest commit at ~5 s per action before
plans/bucketing.py stopped re-creating its stats frame locally).  The
asymmetry survives deployment: Python partitions re-serialize through
the gateway on every execution, a literal plan ships inside the query
plan itself.

Use for the small lookup sides the operators broadcast — hot-cell
membership, IVF bucket-pair tables.  NOT for anything row-count-bound
by data: above ``max_literal_rows`` the helper falls back to
createDataFrame, because a many-thousand-element literal array costs
more in analysis than the Python workers do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def jvm_local_df(
    spark: SparkSession,
    rows: list[tuple],
    schema,
    max_literal_rows: int = 4096,
) -> DataFrame:
    """``rows`` (tuples, matching ``schema`` — a DDL string or a
    StructType) as a DataFrame whose plan is
    ``explode(array(<struct literals>))`` — no Python-backed RDD anywhere
    in it.  Empty input yields a zero-row pure-JVM plan; oversized input
    falls back to createDataFrame."""
    from pyspark.sql.types import StructType, _parse_datatype_string

    st = (
        schema
        if isinstance(schema, StructType)
        else _parse_datatype_string(schema)
    )
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
        )
    if len(rows) > max_literal_rows:
        return spark.createDataFrame(rows, schema)
    bad = [r for r in rows if len(r) != len(st.fields)]
    if bad:
        raise ValueError(
            f"{len(bad)} row(s) have {len(bad[0])} values but the schema "
            f"declares {len(st.fields)} fields (e.g. {bad[0]!r}) — a "
            "zipped literal build would silently truncate"
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(r, st.fields)
            ]
        )
        for r in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_s"))
        .select(*[F.col(f"_s.{f.name}").alias(f.name) for f in st.fields])
        # .to() reconciles with the declared schema; note nullability can
        # come out TIGHTER than createDataFrame's all-nullable (a column
        # whose literals are never None stays non-nullable) — correct
        # metadata, and unions/joins relax as needed
        .to(st)
    )
