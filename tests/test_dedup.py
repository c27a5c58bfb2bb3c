"""Dedup operators: exact + n-gram Jaccard vs DuckDB oracles; MinHash-LSH
and SimHash vs exact pandas/NumPy ground truth on a corpus with constructed
near-duplicates."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators import dedup as dd
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR, assert_same_rows


@pytest.fixture(scope="module")
def corpus(spark):
    """documents + constructed near/exact duplicates (doc_id offset 10_000)."""
    docs = src.load(spark, SF_DIR, "documents").select("doc_id", "text").limit(100)
    exact_copy = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), F.col("text")
    ).filter(F.col("doc_id") % 5 == 0)
    near_copy = docs.select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    ).filter(F.col("doc_id") % 7 == 0)
    return docs.unionByName(exact_copy).unionByName(near_copy).cache()


def _exact_jaccard(corpus, n=3):
    """Pandas ground truth for shingle jaccard of every pair."""
    rows = corpus.collect()
    sets = {}
    for r in rows:
        toks = r["text"].strip().lower().split(" ")
        m = max(len(toks) - n + 1, 1)
        sets[r["doc_id"]] = {" ".join(toks[i:i + n]) for i in range(m)}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            out[(a, b)] = inter / len(sets[a] | sets[b])
    return out


def test_dedup_exact_vs_duckdb(spark, ddb):
    got = dd.dedup_exact(src.load(spark, SF_DIR, "documents"))
    rows = ddb.execute(dd.dedup_exact_sql("documents")).fetchall()
    assert_same_rows(got, rows)


def test_dedup_exact_finds_constructed_dups(corpus):
    res = dd.dedup_exact(corpus)
    dups = {r["doc_id"]: r["canonical_id"] for r in res.filter("is_duplicate").collect()}
    # every exact copy is a duplicate of its source
    for did, canon in dups.items():
        if did >= 10_000 and did < 20_000:
            assert canon == did - 10_000
    assert sum(1 for d in dups if 10_000 <= d < 20_000) == 20


def test_shingles_vs_duckdb(spark, ddb):
    got = dd.shingles(src.load(spark, SF_DIR, "documents"))
    rows = ddb.execute(dd.shingles_sql("documents")).fetchall()
    assert_same_rows(got, rows)


def test_ngram_jaccard_vs_duckdb(spark, ddb):
    got = dd.ngram_jaccard_pairs(
        src.load(spark, SF_DIR, "documents"), threshold=0.2
    )
    rows = ddb.execute(dd.ngram_jaccard_pairs_sql("documents", threshold=0.2)).fetchall()
    assert_same_rows(got, rows)


def test_ngram_jaccard_vs_pandas(corpus):
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in dd.ngram_jaccard_pairs(corpus, threshold=0.5).collect()}
    exact = {p: j for p, j in _exact_jaccard(corpus).items() if j >= 0.5}
    assert set(got) == set(exact)
    for p in got:
        assert abs(got[p] - exact[p]) < 1e-12


def test_minhash_lsh_precision_and_recall(corpus):
    got = {(r["a"], r["b"]) for r in dd.minhash_lsh_pairs(corpus, threshold=0.7).collect()}
    exact = _exact_jaccard(corpus)
    high = {p for p, j in exact.items() if j >= 0.9}
    ok = {p for p, j in exact.items() if j >= 0.7}
    # precision 1 by construction (exact verify)
    assert got <= ok
    # LSH s-curve: near-certain recall for j >= 0.9 pairs
    assert len(got & high) >= 0.9 * len(high) and len(high) > 0


def test_minhash_max_df_consistent(corpus):
    """Capped jaccard = jaccard over shingle sets with df > max_df removed;
    verified pairs stay a subset of the capped exact truth."""
    max_df = 5
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in dd.minhash_lsh_pairs(corpus, threshold=0.7, max_df=max_df).collect()}
    # pandas truth with the same cap
    rows = corpus.collect()
    sets = {}
    for r in rows:
        toks = r["text"].strip().lower().split(" ")
        m = max(len(toks) - 2, 1)
        sets[r["doc_id"]] = {" ".join(toks[i:i + 3]) for i in range(m)}
    from collections import Counter
    df_count = Counter(s for ss in sets.values() for s in ss)
    sets = {d: {s for s in ss if df_count[s] <= max_df} for d, ss in sets.items()}
    ok = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        u = sets[a] | sets[b]
        if not u:
            continue
        j = len(sets[a] & sets[b]) / len(u)
        if j >= 0.7:
            ok[(a, b)] = j
    assert set(got) <= set(ok)
    for p in got:
        assert abs(got[p] - ok[p]) < 1e-12
    # exact copies still found
    assert any(a + 10_000 == b for a, b in got)


def test_simhash_pairs_exact(corpus):
    sigs = {r["doc_id"]: r["simhash"]
            for r in dd.simhash_signatures(corpus).collect()}
    got = {(r["a"], r["b"]): r["hamming"]
           for r in dd.simhash_pairs(corpus, max_hamming=3).collect()}
    expect = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        if h <= 3:
            expect[(a, b)] = h
    assert got == expect and len(expect) > 0