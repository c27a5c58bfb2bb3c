"""Landed MinHash index + incremental near-dup
(operators/dedup_index.py): the incremental op over (landed corpus,
new batch) is VALUE-IDENTICAL to the full-corpus minhash_lsh_pairs
restricted to pairs touching the batch — with and without the
hot-bucket cap, and across appends — and every torn/colliding state is
refused loudly."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators import dedup as dd
from distributed_spatial_index_spark.operators.dedup_index import (
    append_minhash_index,
    incremental_near_dup_pairs,
    land_minhash_index,
)
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR

THRESH = 0.5


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    """(corpus, batch): corpus = documents + exact copies (dup signal
    across the corpus/batch split); batch = near copies of some corpus
    docs plus a few fresh ones, so the expected pair set spans
    batch<->corpus and batch<->batch."""
    docs = (
        src.load(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(80)
    )
    exact_copy = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), F.col("text")
    ).filter(F.col("doc_id") % 5 == 0)
    corpus = docs.unionByName(exact_copy).cache()
    near_copy = docs.select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    ).filter(F.col("doc_id") % 3 == 0)
    batch_exact = docs.select(
        (F.col("doc_id") + 30_000).alias("doc_id"), F.col("text")
    ).filter(F.col("doc_id") % 10 == 0)
    batch = near_copy.unionByName(batch_exact).cache()
    return corpus, batch


def _pairs(df):
    return sorted(
        (r["a"], r["b"], round(r["jaccard"], 12)) for r in df.collect()
    )


def _expected(spark, corpus, batch, max_bucket=None):
    """Full recompute over corpus ∪ batch, restricted to pairs touching
    the batch — the contract the incremental op must reproduce."""
    full = dd.minhash_lsh_pairs(
        corpus.unionByName(batch), threshold=THRESH, max_bucket=max_bucket
    )
    new_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    return sorted(
        (r["a"], r["b"], round(r["jaccard"], 12))
        for r in full.collect()
        if r["a"] in new_ids or r["b"] in new_ids
    )


def test_incremental_equals_full_recompute(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    with tempfile.TemporaryDirectory() as d:
        land_minhash_index(spark, corpus, d)
        got = incremental_near_dup_pairs(
            spark, batch, corpus, d, threshold=THRESH
        )
        assert got.index_stats["new_bucket_rows_broadcast"] is True
        rows = _pairs(got)
        assert rows == _expected(spark, corpus, batch)
        assert rows  # non-vacuous: the constructed dups must show up
        # the scale claim is in the plan: the batch side of the
        # candidate join is broadcast, the landed index is never shuffled
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


def test_incremental_with_hot_bucket_cap_equals_full(
    spark, corpus_and_batch
):
    corpus, batch = corpus_and_batch
    with tempfile.TemporaryDirectory() as d:
        land_minhash_index(spark, corpus, d)
        # max_bucket=2 bites: the exact-copy groups occupy 2-3 docs per
        # band bucket, so decisions diverge unless the incremental op
        # reproduces the full window counts exactly
        got = _pairs(
            incremental_near_dup_pairs(
                spark, batch, corpus, d, threshold=THRESH, max_bucket=2
            )
        )
        exp = _expected(spark, corpus, batch, max_bucket=2)
        assert got == exp
        # the cap must have removed something vs the uncapped run, or
        # this test pins nothing
        assert got != _expected(spark, corpus, batch)


def test_append_then_query_matches_grown_corpus(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    b1 = batch.filter(F.col("doc_id") % 2 == 0).cache()
    b2 = batch.filter(F.col("doc_id") % 2 == 1).cache()
    with tempfile.TemporaryDirectory() as d:
        land_minhash_index(spark, corpus, d)
        n = append_minhash_index(spark, b1, d)
        assert n == b1.count() * 8  # bands rows per doc
        grown = corpus.unionByName(b1)
        got = _pairs(
            incremental_near_dup_pairs(
                spark, b2, grown, d, threshold=THRESH, max_bucket=2
            )
        )
        assert got == _expected(spark, grown, b2, max_bucket=2)


def test_id_collision_refused_on_append_and_query(
    spark, corpus_and_batch
):
    corpus, batch = corpus_and_batch
    with tempfile.TemporaryDirectory() as d:
        land_minhash_index(spark, corpus, d)
        with pytest.raises(ValueError, match="already present"):
            append_minhash_index(spark, corpus.limit(1), d)
        with pytest.raises(ValueError, match="already present"):
            incremental_near_dup_pairs(spark, corpus.limit(1), corpus, d)


def test_torn_index_refused(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    with tempfile.TemporaryDirectory() as d:
        land_minhash_index(spark, corpus, d)
        # simulate a data append whose counts/spec commit never landed
        from distributed_spatial_index_spark.operators.dedup_index import (
            _band_buckets,
            _read_spec,
        )

        spec = _read_spec(d)
        _band_buckets(
            batch, spec["n_hashes"], spec["bands"], spec["n"], "text"
        ).write.mode("append").parquet(f"{d}/buckets")
        with pytest.raises(ValueError, match="torn"):
            incremental_near_dup_pairs(spark, batch, corpus, d)


def test_unlanded_path_refused(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(ValueError, match="no _spec"):
            incremental_near_dup_pairs(spark, batch, corpus, d)
