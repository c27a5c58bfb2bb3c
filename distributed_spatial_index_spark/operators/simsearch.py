"""Similarity search over an embedding column (array<float>).

- cosine_topk: exact brute-force top-k, the correctness baseline.  Query
  vectors broadcast; similarity computed in one Arrow-vectorized pandas UDF
  (np.einsum over the stacked batch — no per-row Python); ranking per query
  via Window over the (tiny) candidate set.
- ivf_topk: the scale path — IVF: k-means centroids (driver NumPy on a
  sample, deterministic), cluster assignment via a broadcast matmul UDF,
  queries probe the nprobe nearest centroid buckets, exact rerank inside.
  At 100 TB the doc side shuffles once on the centroid id (bounded buckets),
  and each query touches nprobe buckets instead of the full table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos_udf():
    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.vstack(a.to_numpy()).astype(np.float64)
        B = np.vstack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(den > 0, num / den, 0.0)
        return pd.Series(out)

    return _cos


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 16,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """emb(vec_id, embedding) -> (query_id, rank, neighbor_id): exact top-k
    cosine neighbors for the first ``n_queries`` vectors (self excluded).
    Scores are intentionally not output: rank order is ULP-stable across
    engines, raw float sums are not."""
    cos = _cos_udf()
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cand = (
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
        .join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cos(F.col("vec"), F.col("qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def cosine_topk_sql(
    table: str = "embeddings", n_queries: int = 16, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    return f"""
        SELECT query_id, rank, neighbor_id FROM (
            SELECT q.{id_col} AS query_id,
                   p.{id_col} AS neighbor_id,
                   CAST(row_number() OVER (
                       PARTITION BY q.{id_col}
                       ORDER BY list_cosine_similarity(
                           CAST(p.{vec_col} AS DOUBLE[]),
                           CAST(q.{vec_col} AS DOUBLE[])) DESC,
                           p.{id_col}
                   ) AS INTEGER) AS rank
            FROM {table} p, {table} q
            WHERE q.{id_col} < {n_queries} AND p.{id_col} <> q.{id_col}
        ) WHERE rank <= {k}
    """


# --- IVF (scale path) --------------------------------------------------------


def _seed_sample(
    emb: DataFrame, id_col: str, vec_col: str, cap: int = 20000,
    fraction: float = 1.0,
) -> np.ndarray:
    """Deterministic k-means seed sample: filter by a hash of the id (when
    subsampling), then take the ``cap`` LOWEST ids (TakeOrdered — a per-
    partition top-k + driver merge, no full sort).  Unlike a bare
    ``limit(cap)``, the result is independent of partition layout, so plans
    and centroids are reproducible run to run (same discipline as the STR
    gate's ``id % 37`` sample)."""
    base = emb.select(id_col, vec_col)
    if fraction < 1.0:
        base = base.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(10000))
            < F.lit(int(fraction * 10000))
        )
    rows = base.orderBy(id_col).limit(cap).collect()
    return np.vstack([
        np.asarray(r[vec_col], dtype=np.float64) for r in rows
    ])


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    """Plain Lloyd's k-means (driver-side, deterministic)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=n_clusters, replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(0)
    return cent


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.3,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b): all pairs with cosine similarity >= threshold — EXACT, with
    k-means ball-bound blocking (embedding-cosine near-dup for training-data
    pipelines).

    Exactness: cos(x,y) >= t  <=>  ||x_n - y_n|| <= d = sqrt(2-2t) on the
    normalized vectors, and by the triangle inequality such a pair can only
    span buckets (i, j) with ||c_i - c_j|| <= d + r_i + r_j (r = bucket
    radius).  So only NEAR bucket pairs are joined — far pairs are pruned
    with zero recall loss.  At 100 TB: one shuffle on the bucket-pair key,
    per-pair fan-out bounded by each bucket's near-neighbor count; the
    all-pairs quadratic never materializes unless the data is one tight
    ball (in which case it IS the answer).
    """
    import math

    spark = emb.sparkSession
    sample = _seed_sample(emb, id_col, vec_col)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    sample = np.where(norms > 0, sample / np.where(norms == 0, 1, norms), 0.0)
    cent = _kmeans(sample, n_clusters)
    bc = spark.sparkContext.broadcast(cent)

    @F.pandas_udf("struct<bucket:int, r:double>")
    def _assign_r(v: pd.Series) -> pd.DataFrame:
        V = np.vstack(v.to_numpy()).astype(np.float64)
        nn = np.linalg.norm(V, axis=1, keepdims=True)
        Vn = np.where(nn > 0, V / np.where(nn == 0, 1, nn), 0.0)
        c = bc.value
        d = np.sqrt(((Vn[:, None, :] - c[None, :, :]) ** 2).sum(-1))
        b = d.argmin(1)
        return pd.DataFrame({
            "bucket": b.astype(np.int32),
            "r": d[np.arange(len(b)), b],
        })

    docs = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("br", _assign_r(F.col("vec"))).select(
        "vid", "vec", F.col("br.bucket").alias("bucket"), F.col("br.r").alias("r")
    ).persist()  # radii action + both join sides read it; released below
    # once the (answer-sized) result is materialized
    radii = {
        r["bucket"]: r["rmax"]
        for r in docs.groupBy("bucket").agg(F.max("r").alias("rmax")).collect()
    }

    d_max = math.sqrt(max(0.0, 2.0 - 2.0 * threshold))
    cdist = np.sqrt(((cent[:, None, :] - cent[None, :, :]) ** 2).sum(-1))
    pair_rows = []
    pk = 0
    for i in sorted(radii):
        for j in sorted(radii):
            if j < i:
                continue
            if cdist[i, j] <= d_max + radii[i] + radii[j]:
                pair_rows.append((pk, i, j))
                pk += 1
    from distributed_spatial_index_spark.functions.local_rel import (
        jvm_local_df,
    )

    # broadcast twice below: a pure-JVM literal plan, not createDataFrame
    # (whose Python-backed partitions re-serialize per broadcast build)
    pairs_df = jvm_local_df(spark, pair_rows, "pk long, ba int, bb int")

    left = docs.join(
        F.broadcast(pairs_df), docs["bucket"] == pairs_df["ba"]
    ).select("pk", "ba", "bb", F.col("vid").alias("xid"), F.col("vec").alias("xv"))
    right = docs.join(
        F.broadcast(pairs_df.select("pk", "bb").withColumnRenamed("bb", "b2")),
        docs["bucket"] == F.col("b2"),
    ).select(F.col("pk").alias("pk2"), F.col("vid").alias("yid"),
             F.col("vec").alias("yv"))
    cos = _cos_udf()
    cand = (
        left.join(right, left["pk"] == right["pk2"])
        # each unordered pair appears once for ba<bb (any id order) and
        # twice for ba==bb (both orders) -> keep exactly one occurrence
        .filter((F.col("ba") < F.col("bb")) | (F.col("xid") < F.col("yid")))
        .filter(F.col("xid") != F.col("yid"))
        .withColumn("sim", cos(F.col("xv"), F.col("yv")))
        .filter(F.col("sim") >= F.lit(threshold))
    )
    out = cand.select(
        F.least("xid", "yid").alias("a"), F.greatest("xid", "yid").alias("b")
    )
    # materialize the (small: answer-sized) result so the docs cache can be
    # released before returning — repeated calls in a long-lived session
    # must not accumulate cached RDDs (same discipline as knn())
    out = out.persist()
    try:
        out.count()
    finally:
        docs.unpersist()  # release even when the count raises
    return out


def embedding_dup_pairs_sql(
    table: str = "embeddings", threshold: float = 0.3,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    """Brute-force DuckDB twin (similarity scores are not output: raw float
    sums are not ULP-stable across engines, pair membership at a threshold
    away from any pair's value is)."""
    return f"""
        SELECT a.{id_col} AS a, b.{id_col} AS b
        FROM {table} a, {table} b
        WHERE a.{id_col} < b.{id_col}
          AND list_cosine_similarity(CAST(a.{vec_col} AS DOUBLE[]),
                                     CAST(b.{vec_col} AS DOUBLE[]))
              >= {threshold!r}
    """


def ivf_recall_contract(
    emb: DataFrame,
    n_queries: int = 16,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    avg_bound: float = 0.5,
    min_bound: float = 0.15,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row contract for the APPROXIMATE IVF path (nprobe < n_clusters):
    (n_queries, avg_recall_ok, min_recall_ok) against the exact brute-force
    top-k.  The raw recall value is engine/data-specific (not SQL-oracle-
    able) but the contract is: the oracle expects (count, true, true), so a
    regression in probe selection (_probes) fails the driver gate loudly —
    the approx_distinct_parts pattern (operators/relational.py).  All
    inputs are deterministic (seeded k-means over the id-ordered sample),
    so the booleans are stable, not flaky."""
    exact = cosine_topk(emb, n_queries, k, id_col, vec_col)
    approx = ivf_topk(emb, n_queries, k, n_clusters, nprobe,
                      id_col=id_col, vec_col=vec_col)
    hit = exact.join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"],
        "left_semi",
    )
    per_q = (
        exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
        .join(
            hit.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id", "left",
        )
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact")).alias("recall"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (F.avg("recall") >= F.lit(avg_bound)).alias("avg_recall_ok"),
        (F.min("recall") >= F.lit(min_bound)).alias("min_recall_ok"),
    )


def ivf_recall_contract_sql(table: str = "embeddings", n_queries: int = 16) -> str:
    return (
        f"SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries, "
        f"true AS avg_recall_ok, true AS min_recall_ok "
        f"FROM {table} WHERE vec_id < {n_queries}"
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 16,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_fraction: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest IVF buckets, exact
    cosine rerank inside them.  Returns (query_id, rank, neighbor_id)."""
    spark = emb.sparkSession
    sample = _seed_sample(emb, id_col, vec_col, fraction=sample_fraction)
    cent = _kmeans(sample, n_clusters)
    bc = spark.sparkContext.broadcast(cent)

    @F.pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy()).astype(np.float64)
        c = bc.value
        d = ((V[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return pd.Series(d.argmin(1).astype(np.int32))

    ret_t = "array<int>"

    @F.pandas_udf(ret_t)
    def _probes(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy()).astype(np.float64)
        c = bc.value
        d = ((V[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    docs = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", _assign(F.col("vec")))
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("bucket", F.explode(_probes(F.col("qvec"))))

    cos = _cos_udf()
    cand = (
        docs.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cos(F.col("vec"), F.col("qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
