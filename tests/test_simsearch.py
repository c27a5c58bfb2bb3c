"""Similarity search: exact brute-force vs NumPy + DuckDB oracles; IVF
recall vs the exact baseline."""

from __future__ import annotations

import numpy as np

from distributed_spatial_index_spark.operators.simsearch import (
    cosine_topk,
    cosine_topk_sql,
    ivf_topk,
)
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR, assert_same_rows


def _numpy_topk(emb_rows, n_queries, k):
    ids = np.array([r["vec_id"] for r in emb_rows])
    V = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in emb_rows])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    out = set()
    for qi in np.flatnonzero(ids < n_queries):
        sims = V @ V[qi]
        order = sorted(
            ((float(-sims[j]), int(ids[j])) for j in range(len(ids)) if j != qi)
        )[:k]
        for rank, (_, nid) in enumerate(order, 1):
            out.add((int(ids[qi]), rank, nid))
    return out


def test_cosine_topk_vs_numpy(spark):
    emb = src.load(spark, SF_DIR, "embeddings")
    got = {tuple(r) for r in cosine_topk(emb, n_queries=8, k=10).collect()}
    expect = _numpy_topk(emb.collect(), 8, 10)
    assert got == expect


def test_cosine_topk_vs_duckdb(spark, ddb):
    emb = src.load(spark, SF_DIR, "embeddings")
    got = cosine_topk(emb, n_queries=16, k=10)
    rows = ddb.execute(cosine_topk_sql("embeddings", 16, 10)).fetchall()
    assert_same_rows(got, rows)


def test_ivf_recall(spark):
    """Partial probing finds most true neighbors (gaussian data has little
    cluster structure, so the bar is modest); probing ALL buckets must
    reproduce the exact result set bit-for-bit."""
    emb = src.load(spark, SF_DIR, "embeddings")
    exact = {tuple(r) for r in cosine_topk(emb, n_queries=16, k=10).collect()}
    exact_pairs = {(q, n) for q, _, n in exact}

    approx = {tuple(r) for r in
              ivf_topk(emb, n_queries=16, k=10, n_clusters=16, nprobe=6).collect()}
    approx_pairs = {(q, n) for q, _, n in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, recall

    full = {tuple(r) for r in
            ivf_topk(emb, n_queries=16, k=10, n_clusters=16, nprobe=16).collect()}
    assert full == exact

def test_embedding_dup_pairs_vs_duckdb(spark, ddb):
    from distributed_spatial_index_spark.operators.simsearch import (
        embedding_dup_pairs,
        embedding_dup_pairs_sql,
    )

    emb = src.load(spark, SF_DIR, "embeddings")
    got = embedding_dup_pairs(emb, threshold=0.3)
    rows = ddb.execute(embedding_dup_pairs_sql("embeddings", 0.3)).fetchall()
    assert_same_rows(got, rows)
    assert len(rows) > 0  # the gate is non-trivial at this threshold


def test_embedding_dup_pairs_blocking_is_lossless(spark):
    """Ball-bound bucket-pair pruning must equal the unblocked run
    (n_clusters=1 compares everything)."""
    from distributed_spatial_index_spark.operators.simsearch import (
        embedding_dup_pairs,
    )

    emb = src.load(spark, SF_DIR, "embeddings")
    blocked = sorted(
        map(tuple, embedding_dup_pairs(emb, threshold=0.35, n_clusters=16).collect())
    )
    unblocked = sorted(
        map(tuple, embedding_dup_pairs(emb, threshold=0.35, n_clusters=1).collect())
    )
    assert blocked == unblocked and len(blocked) > 0
