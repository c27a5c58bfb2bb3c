"""Landed embedding index + incremental near-dup
(operators/simsearch_index.py): the incremental op equals a brute-force
cosine oracle over (corpus ∪ batch) restricted to pairs touching the
batch — across appends — the ball-bound bucket pruning actually skips
corpus buckets on clustered data, and torn/colliding states refuse."""

from __future__ import annotations

import itertools
import tempfile

import numpy as np
import pytest

from distributed_spatial_index_spark.operators.simsearch_index import (
    append_embedding_index,
    incremental_embedding_dup_pairs,
    land_embedding_index,
)
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR

THRESH = 0.35


def _vecs(df):
    return {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in df.collect()
    }


def _expected(corpus_df, batch_df, threshold):
    """Brute-force float64 cosine over corpus ∪ batch, pairs touching the
    batch."""
    cv, bv = _vecs(corpus_df), _vecs(batch_df)
    allv = {**cv, **bv}
    out = set()
    for a, b in itertools.combinations(sorted(allv), 2):
        if a not in bv and b not in bv:
            continue
        x, y = allv[a], allv[b]
        den = np.linalg.norm(x) * np.linalg.norm(y)
        sim = float(x @ y / den) if den > 0 else 0.0
        if sim >= threshold:
            out.add((a, b))
    return sorted(out)


def _got(df):
    return sorted((r["a"], r["b"]) for r in df.collect())


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    """corpus = embeddings table; batch = scaled copies of every 7th
    vector (cosine 1 with their originals — guaranteed cross pairs) plus
    lightly perturbed copies of every 11th (near-dup signal)."""
    from pyspark.sql import functions as F

    emb = src.load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    # keep the batch the SAME element type as the landed corpus (float):
    # storage type is an ingest-time contract, checked loudly on append
    copies = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0))
        .cast("array<float>").alias("embedding"),
    )
    near = emb.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + 20_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01))
        .cast("array<float>").alias("embedding"),
    )
    return emb.cache(), copies.unionByName(near).cache()


def test_incremental_equals_brute_force(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    with tempfile.TemporaryDirectory() as d:
        land_embedding_index(spark, corpus, d)
        got = incremental_embedding_dup_pairs(
            spark, batch, d, threshold=THRESH
        )
        rows = _got(got)
        assert rows == _expected(corpus, batch, THRESH)
        assert rows  # the constructed copies must pair up
        assert got.index_stats["n_buckets"] == 16


def test_append_then_query_matches_grown_corpus(spark, corpus_and_batch):
    from pyspark.sql import functions as F

    corpus, batch = corpus_and_batch
    b1 = batch.filter(F.col("vec_id") % 2 == 0).cache()
    b2 = batch.filter(F.col("vec_id") % 2 == 1).cache()
    with tempfile.TemporaryDirectory() as d:
        land_embedding_index(spark, corpus, d)
        n = append_embedding_index(spark, b1, d)
        assert n == b1.count()
        got = _got(
            incremental_embedding_dup_pairs(spark, b2, d, threshold=THRESH)
        )
        assert got == _expected(corpus.unionByName(b1), b2, THRESH)


def test_bucket_pruning_bites_on_clustered_corpus(spark):
    """Four well-separated direction groups at threshold 0.9: the near
    bucket-pair bound must exclude cross-group buckets, so the corpus
    scan reads strictly fewer bucket partitions than exist — while the
    answer still equals brute force (lossless)."""
    emb = src.load(spark, SF_DIR, "embeddings").limit(200)
    rows = emb.collect()
    dim = len(rows[0]["embedding"])
    data = []
    for r in rows:
        g = r["vec_id"] % 4
        base = np.zeros(dim)
        base[g] = 10.0
        v = base + 0.05 * np.asarray(r["embedding"], dtype=np.float64)
        data.append((int(r["vec_id"]), [float(x) for x in v]))
    corpus = spark.createDataFrame(
        data, "vec_id long, embedding array<double>"
    ).cache()
    from pyspark.sql import functions as F

    # batch from ONE direction group: only that group's bucket
    # partitions should be read (a batch spanning every group would
    # legitimately need every non-empty bucket)
    batch = corpus.filter(
        (F.col("vec_id") % 4 == 0) & (F.col("vec_id") < 40)
    ).selectExpr("vec_id + 10000 as vec_id", "embedding").cache()
    with tempfile.TemporaryDirectory() as d:
        land_embedding_index(spark, corpus, d, n_clusters=8)
        got = incremental_embedding_dup_pairs(spark, batch, d, threshold=0.9)
        rows_got = _got(got)
        assert rows_got == _expected(corpus, batch, 0.9)
        assert rows_got
        assert (
            0
            < got.index_stats["corpus_buckets_read"]
            < got.index_stats["n_buckets"]
        )
        # IO-level witness, not just the stats dict: the corpus scan's
        # bucket filter must reach the plan's PartitionFilters (Spark
        # skips the other bucket DIRECTORIES at planning time — unlike
        # DataFilters, which read and then discard).  inputFiles() is
        # deliberately NOT used: it lists the unpruned FileIndex.
        plan = got._jdf.queryExecution().executedPlan().toString()
        pfs = [
            seg.split("]")[0]
            for seg in plan.split("PartitionFilters: [")[1:]
        ]
        assert any("bucket#" in p for p in pfs), pfs


def test_id_collision_refused(spark, corpus_and_batch):
    corpus, _ = corpus_and_batch
    with tempfile.TemporaryDirectory() as d:
        land_embedding_index(spark, corpus, d)
        with pytest.raises(ValueError, match="already present"):
            append_embedding_index(spark, corpus.limit(1), d)
        with pytest.raises(ValueError, match="already present"):
            incremental_embedding_dup_pairs(spark, corpus.limit(1), d)


def test_torn_index_refused(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    with tempfile.TemporaryDirectory() as d:
        land_embedding_index(spark, corpus, d)
        # a data append whose stats commit never landed (same-typed rows,
        # so only the row count disagrees)
        from distributed_spatial_index_spark.operators.simsearch_index import (
            _assign,
            _load_geometry,
        )

        cent, _ = _load_geometry(spark, d)
        _assign(
            batch, cent, "vec_id", "embedding"
        ).write.mode("append").partitionBy("bucket").parquet(f"{d}/vectors")
        with pytest.raises(ValueError, match="torn"):
            incremental_embedding_dup_pairs(spark, batch, d)


def test_unlanded_path_refused(spark, corpus_and_batch):
    _, batch = corpus_and_batch
    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(ValueError, match="no _spec"):
            incremental_embedding_dup_pairs(spark, batch, d)
