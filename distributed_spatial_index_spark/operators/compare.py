"""Result-set comparison: the engine-level form of the reference's oracle
diff (ResultCompare.java:11-41 — order-insensitive per-query set equality
via symmetric HashSet.removeAll).

Used in tests and as a production self-check (e.g. salted vs unsalted join
must produce identical sets); one full-outer join on the pair key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def result_diff(
    a: DataFrame, b: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Symmetric difference of two result sets on ``keys`` (default: all
    shared columns).  Returns (*keys, in_a, in_b) rows only where the sides
    disagree — empty means equal sets."""
    keys = keys or [c for c in a.columns if c in set(b.columns)]
    da = a.select(*keys).distinct().withColumn("in_a", F.lit(True))
    db = b.select(*keys).distinct().withColumn("in_b", F.lit(True))
    return (
        da.join(db, keys, "full_outer")
        .filter(F.col("in_a").isNull() | F.col("in_b").isNull())
        .select(*keys,
                F.coalesce(F.col("in_a"), F.lit(False)).alias("in_a"),
                F.coalesce(F.col("in_b"), F.lit(False)).alias("in_b"))
    )


def per_query_diff_counts(
    a: DataFrame, b: DataFrame, query_col: str = "query_id",
    keys: list[str] | None = None,
) -> DataFrame:
    """(query_id, n_only_a, n_only_b) per query with any disagreement —
    the reference's per-queryID mismatch report."""
    d = result_diff(a, b, keys)
    return d.groupBy(query_col).agg(
        F.sum(F.when(F.col("in_a") & ~F.col("in_b"), 1).otherwise(0)).alias("n_only_a"),
        F.sum(F.when(F.col("in_b") & ~F.col("in_a"), 1).otherwise(0)).alias("n_only_b"),
    )
