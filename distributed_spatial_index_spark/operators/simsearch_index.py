"""Landed embedding near-dup index + incremental detection — the
embedding twin of operators/dedup_index.py.

operators/simsearch.embedding_dup_pairs answers "find all embedding
near-dup pairs in THIS table" with k-means ball-bound blocking, exact
and one full scan.  The nightly-ingest op is "find the near-dups of
TODAY'S embedding batch against everything already ingested"; this
module lands the corpus ONCE as an IVF-shaped layout and serves
increments from it:

* ``land_embedding_index`` — one corpus scan: k-means centroids (frozen
  at land time — standard IVF practice), every vector assigned to its
  nearest centroid and written hive-partitioned BY BUCKET under
  ``<path>/vectors`` (the index IS the bucket-organized copy of the
  vectors, so a query reads only the bucket directories it needs);
  centroids and per-bucket (rmax, n) stats committed as VERSIONED
  metadata (sources/metastore.py — readers pin both artifacts to one
  version); parameters in ``<path>/_spec``.
* ``append_embedding_index`` — assign a new batch to the FROZEN
  centroids, append its bucket partitions (cost ∝ batch), merge its
  stats into a new metadata version.  Centroid drift under growth makes
  buckets wider (rmax grows), which degrades PRUNING but never
  correctness — the ball bound uses the maintained radii; re-cluster
  (re-land) when pruning degrades, exactly the IVF rebuild discipline
  (and the same honesty as dedup_index's frozen-DF contract).
* ``incremental_embedding_dup_pairs`` — exact pairs (cos >= threshold)
  with at least one side in the batch.  The ball-bound lemma
  (simsearch.embedding_dup_pairs) picks the near (batch-bucket, any-
  bucket) pairs from centroid geometry + committed radii — DRIVER MATH
  over n_clusters rows; the corpus side then reads ONLY those bucket
  partitions (directory pruning on the landed layout), the batch side
  broadcasts, and the exact cosine verify runs on candidates.  Lossless
  by the same triangle-inequality argument, so results are
  value-identical to a brute-force over (corpus ∪ batch) restricted to
  pairs touching the batch — pinned by tests/test_simsearch_index.py.

Same loud-failure contract as dedup_index: a torn index (data append
without its stats commit) and doc-id collisions are refused.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.simsearch import (
    _cos_udf,
    _kmeans,
    _seed_sample,
)
from distributed_spatial_index_spark.sources.metastore import (
    meta_commit,
    meta_read,
    meta_version,
)

_SPEC_FILE = "_spec"
_VECTORS_DIR = "vectors"


def _root(path: str) -> str:
    from distributed_spatial_index_spark.sources.metastore import _root

    return _root(path)


def _read_spec(path: str) -> dict:
    try:
        with open(os.path.join(_root(path), _SPEC_FILE)) as f:
            return json.load(f)
    except FileNotFoundError as exc:
        raise ValueError(
            f"{path} carries no {_SPEC_FILE} file — not a landed embedding "
            "index; build it with land_embedding_index"
        ) from exc


def _write_spec(path: str, spec: dict) -> None:
    target = os.path.join(_root(path), _SPEC_FILE)
    tmp = f"{target}.tmp"
    with open(tmp, "w") as f:
        json.dump(spec, f)
    os.replace(tmp, target)


def _assign(emb: DataFrame, cent: np.ndarray, id_col: str,
            vec_col: str) -> DataFrame:
    """(vid, bucket, r, vec): nearest frozen centroid per vector plus the
    distance to it (on normalized vectors — the geometry the ball bound
    lives in).  Same math as simsearch.embedding_dup_pairs' assignment."""
    bc = emb.sparkSession.sparkContext.broadcast(cent)

    @F.pandas_udf("struct<bucket:int, r:double>")
    def _a(v: pd.Series) -> pd.DataFrame:
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

    return (
        emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .withColumn("br", _a(F.col("vec")))
        .select(
            "vid", "vec",
            F.col("br.bucket").alias("bucket"), F.col("br.r").alias("r"),
        )
    )


def _stats(assigned: DataFrame) -> DataFrame:
    return assigned.groupBy("bucket").agg(
        F.max("r").alias("rmax"), F.count(F.lit(1)).alias("n")
    )


def _vectors_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(_root(path), _VECTORS_DIR))


def _check_fresh(spark: SparkSession, path: str, spec: dict) -> DataFrame:
    vectors = _vectors_table(spark, path)
    n = vectors.count()
    if n != spec["n_rows"]:
        raise ValueError(
            f"embedding index at {path} is torn: vector table holds {n} "
            f"rows but the spec records {spec['n_rows']} — a data append "
            "ran without its stats commit; re-land the index"
        )
    return vectors


def _refuse_id_collision(
    vectors: DataFrame, emb_new: DataFrame, id_col: str, path: str, op: str
) -> None:
    dup = (
        vectors.join(
            F.broadcast(
                emb_new.select(F.col(id_col).alias("vid")).distinct()
            ),
            "vid",
        )
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            f"{op}: batch {id_col}(s) already present in the index at "
            f"{path} — ids must be unique across the corpus"
        )


def land_embedding_index(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build the landed index at ``path`` from one corpus scan (overwrite
    semantics — rebuild; the append path is append_embedding_index)."""
    sample = _seed_sample(emb, id_col, vec_col)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    sample = np.where(norms > 0, sample / np.where(norms == 0, 1, norms), 0.0)
    cent = _kmeans(sample, n_clusters)
    assigned = _assign(emb, cent, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(_root(path), _VECTORS_DIR)
    )
    landed = _vectors_table(spark, path)
    cent_df = spark.createDataFrame(
        [(i, cent[i].tolist()) for i in range(len(cent))],
        "bucket int, c array<double>",
    )
    meta_commit(
        path,
        {
            "centroids": cent_df.coalesce(1),
            "bucket_stats": _stats(landed).coalesce(1),
        },
    )
    _write_spec(
        path,
        {
            "n_clusters": n_clusters,
            "id_col": id_col,
            "vec_col": vec_col,
            "n_rows": landed.count(),
        },
    )


def _load_geometry(
    spark: SparkSession, path: str
) -> tuple[np.ndarray, dict[int, float]]:
    """(centroids, {bucket: rmax}) pinned to ONE committed metadata
    version (the knn_landed pinned-pair discipline)."""
    v = meta_version(path)
    cent_rows = meta_read(spark, path, "centroids", v).collect()
    cent = np.zeros((len(cent_rows), len(cent_rows[0]["c"])))
    for r in cent_rows:
        cent[r["bucket"]] = np.asarray(r["c"], dtype=np.float64)
    rmax = {
        r["bucket"]: r["rmax"]
        for r in meta_read(spark, path, "bucket_stats", v).collect()
    }
    return cent, rmax


def append_embedding_index(
    spark: SparkSession, emb_new: DataFrame, path: str
) -> int:
    """Assign a new batch to the frozen centroids, append its bucket
    partitions, merge its stats into a new committed metadata version.
    Returns the number of vectors appended."""
    spec = _read_spec(path)
    vectors = _check_fresh(spark, path, spec)
    _refuse_id_collision(
        vectors, emb_new, spec["id_col"], path, "append_embedding_index"
    )
    # storage element type is an ingest-time contract: silently mixing
    # float32 and float64 files under one partitioned dir breaks readers
    want = vectors.schema["vec"].dataType.simpleString()
    got = emb_new.schema[spec["vec_col"]].dataType.simpleString()
    if got != want:
        raise ValueError(
            f"append_embedding_index: batch {spec['vec_col']} is {got} "
            f"but the index stores {want} — cast the batch before append"
        )
    cent, _ = _load_geometry(spark, path)
    assigned = _assign(
        emb_new, cent, spec["id_col"], spec["vec_col"]
    ).persist()
    n_new = assigned.count()
    assigned.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(_root(path), _VECTORS_DIR)
    )
    v = meta_version(path)
    merged = (
        meta_read(spark, path, "bucket_stats", v)
        .unionByName(_stats(assigned))
        .groupBy("bucket")
        .agg(F.max("rmax").alias("rmax"), F.sum("n").alias("n"))
    )
    meta_commit(path, {"bucket_stats": merged.coalesce(1),
                       "centroids": meta_read(spark, path, "centroids", v)})
    spec["n_rows"] += n_new
    _write_spec(path, spec)
    assigned.unpersist()
    return n_new


def incremental_embedding_dup_pairs(
    spark: SparkSession,
    emb_new: DataFrame,
    path: str,
    threshold: float = 0.3,
) -> DataFrame:
    """(a, b): exact pairs with cosine >= threshold and AT LEAST ONE side
    in the batch — batch↔corpus plus batch↔batch — at batch cost:

    * bucket-pair selection is driver math over n_clusters rows
      (centroid distances + committed radii, pinned to one metadata
      version), by the same lossless triangle-inequality bound as
      simsearch.embedding_dup_pairs — with the batch side's radii from
      the batch itself and the union side's from max(committed, batch);
    * the corpus reads ONLY the bucket partitions named by some near
      pair (hive directory pruning on the landed layout — disclosed as
      ``.index_stats['corpus_buckets_read']`` vs ``n_clusters``);
    * the batch side (assignments + bucket-pair keys) broadcasts; exact
      cosine verification runs on candidates only.

    The batch is NOT appended — call append_embedding_index once the
    batch is accepted (detect and ingest stay separate)."""
    spec = _read_spec(path)
    vectors = _check_fresh(spark, path, spec)
    _refuse_id_collision(
        vectors, emb_new, spec["id_col"], path,
        "incremental_near_dup_pairs",
    )
    cent, corpus_rmax = _load_geometry(spark, path)
    assigned_b = _assign(
        emb_new, cent, spec["id_col"], spec["vec_col"]
    ).localCheckpoint(eager=False)
    batch_rmax = {
        r["bucket"]: r["rmax"]
        for r in assigned_b.groupBy("bucket")
        .agg(F.max("r").alias("rmax"))
        .collect()
    }

    d_max = math.sqrt(max(0.0, 2.0 - 2.0 * threshold))
    cdist = np.sqrt(((cent[:, None, :] - cent[None, :, :]) ** 2).sum(-1))
    union_rmax = dict(corpus_rmax)
    for b, r in batch_rmax.items():
        union_rmax[b] = max(union_rmax.get(b, 0.0), r)
    pair_rows = []
    pk = 0
    for i in sorted(batch_rmax):
        for j in sorted(union_rmax):
            if cdist[i, j] <= d_max + batch_rmax[i] + union_rmax[j]:
                pair_rows.append((pk, i, j))
                pk += 1
    from distributed_spatial_index_spark.functions.local_rel import (
        jvm_local_df,
    )

    pairs_df = jvm_local_df(spark, pair_rows, "pk long, ba int, bb int")

    needed = sorted(
        {j for _, _, j in pair_rows if j in corpus_rmax}
    )
    corpus_side = vectors.filter(F.col("bucket").isin(needed)).select(
        "vid", "bucket", "vec"
    )
    union_side = corpus_side.unionByName(
        assigned_b.select("vid", "bucket", "vec")
    )
    left = (
        assigned_b.join(F.broadcast(pairs_df), assigned_b["bucket"] == pairs_df["ba"])
        .select("pk", F.col("vid").alias("xid"), F.col("vec").alias("xv"))
    )
    right = (
        union_side.join(
            F.broadcast(pairs_df.select("pk", "bb")),
            union_side["bucket"] == F.col("bb"),
        )
        .select(F.col("pk").alias("pk2"), F.col("vid").alias("yid"),
                F.col("vec").alias("yv"))
    )
    cos = _cos_udf()
    cand = (
        left.join(right, left["pk"] == right["pk2"])
        .filter(F.col("xid") != F.col("yid"))
        .withColumn("sim", cos(F.col("xv"), F.col("yv")))
        .filter(F.col("sim") >= F.lit(threshold))
    )
    # a batch↔batch pair can arrive through both (i,j) and (j,i), and a
    # same-bucket pair in both id orders: canonicalize + dedup
    out = cand.select(
        F.least("xid", "yid").alias("a"), F.greatest("xid", "yid").alias("b")
    ).dropDuplicates(["a", "b"])
    out.index_stats = {
        "corpus_buckets_read": len(needed),
        "n_buckets": spec["n_clusters"],
        "bucket_pairs": len(pair_rows),
    }
    return out
