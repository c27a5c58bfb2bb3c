"""Text-analysis ops vs DuckDB oracles."""

from __future__ import annotations

import pytest

from distributed_spatial_index_spark.operators import textstats as ts
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR, assert_same_rows


@pytest.mark.parametrize(
    "op,sql",
    [
        (ts.token_count, ts.token_count_sql),
        (ts.lang_id, ts.lang_id_sql),
        (ts.quality_score, ts.quality_score_sql),
        (ts.fingerprint, ts.fingerprint_sql),
    ],
)
def test_textstat_vs_duckdb(spark, ddb, op, sql):
    docs = src.load(spark, SF_DIR, "documents")
    got = op(docs)
    rows = ddb.execute(sql("documents")).fetchall()
    assert_same_rows(got, rows)
    assert got.count() == 500


def test_lang_id_markers(spark):
    docs = spark.createDataFrame(
        [(1, "der hund und die katze ist hier"),
         (2, "the cat and the dog is here"),
         (3, "xyzzy plugh")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in ts.lang_id(docs).collect()}
    assert got == {1: "de", 2: "en", 3: "und"}


def test_clean_corpus_vs_duckdb(spark, ddb):
    from distributed_spatial_index_spark.operators.textstats import (
        clean_corpus,
        clean_corpus_sql,
    )

    got = clean_corpus(src.load(spark, SF_DIR, "documents"))
    rows = ddb.execute(clean_corpus_sql("documents")).fetchall()
    assert_same_rows(got, rows)
    n = got.count()
    assert 0 < n < 500  # the filters actually filter


def test_top_terms_vs_duckdb(spark, ddb):
    docs = src.load(spark, SF_DIR, "documents")
    got = ts.top_terms(docs, k=10)
    rows = ddb.execute(ts.top_terms_sql("documents", k=10)).fetchall()
    assert_same_rows(got, rows)
    # exactly k rows per language, ranks 1..k, counts non-increasing
    per_lang = {}
    for r in got.collect():
        per_lang.setdefault(r["lang"], []).append((r["rank"], r["n"]))
    for lang, rs in per_lang.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i][1] >= rs[i + 1][1] for i in range(len(rs) - 1))
