"""Result-diff operator (the reference's ResultCompare semantics)."""

from __future__ import annotations

from distributed_spatial_index_spark.operators.compare import (
    per_query_diff_counts,
    result_diff,
)


def test_equal_sets_diff_empty(spark):
    a = spark.createDataFrame([(1, 10), (1, 11), (2, 20)], "query_id long, doc_id long")
    b = spark.createDataFrame([(2, 20), (1, 11), (1, 10)], "query_id long, doc_id long")
    assert result_diff(a, b).count() == 0


def test_diff_reports_both_directions(spark):
    a = spark.createDataFrame([(1, 10), (1, 11)], "query_id long, doc_id long")
    b = spark.createDataFrame([(1, 11), (1, 12), (3, 30)], "query_id long, doc_id long")
    rows = {(r["query_id"], r["doc_id"]): (r["in_a"], r["in_b"])
            for r in result_diff(a, b).collect()}
    assert rows == {(1, 10): (True, False), (1, 12): (False, True),
                    (3, 30): (False, True)}
    counts = {r["query_id"]: (r["n_only_a"], r["n_only_b"])
              for r in per_query_diff_counts(a, b).collect()}
    assert counts == {1: (1, 1), 3: (0, 1)}


def test_duplicates_ignored_set_semantics(spark):
    a = spark.createDataFrame([(1, 10), (1, 10)], "query_id long, doc_id long")
    b = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
    assert result_diff(a, b).count() == 0