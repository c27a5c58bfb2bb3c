"""Landed MinHash signature index + incremental near-duplicate detection.

operators/dedup.py's minhash_lsh_pairs answers "find all near-dup pairs
in THIS corpus" — one full scan of the text.  The op a 100-TB training
pipeline actually runs nightly is different: "find the near-dups of
TODAY'S batch against everything already ingested", and rescanning the
corpus per batch is exactly the cost a landed index exists to remove
(the same argument as knn_landed's committed density,
plans/bucketing.py:454).  This module lands the corpus's LSH band
buckets ONCE and serves increments from them:

* ``land_minhash_index`` — one corpus scan computes the band-bucket
  table (doc_id, band, key): ``bands`` rows per doc, three fixed-width
  columns — ~1% of corpus text bytes.  The data lands as parquet under
  ``<path>/buckets``; the index parameters (n_hashes/bands/shingle n —
  signatures are only comparable under identical parameters) persist as
  ``<path>/_spec`` (atomic temp+rename, the plans/bucketing.py
  ``_write_spec_file`` contract); the per-bucket occupancy counts land
  as a VERSIONED metadata artifact through sources/metastore.py
  (``bucket_counts``) so the hot-bucket guard is a metadata read, the
  way knn_landed reads the committed density instead of re-aggregating.
* ``append_minhash_index`` — a new batch appends its bucket rows (cost
  ∝ batch, not corpus) and merges its counts into a NEW metadata
  version (read-old-commit-new, the update_bucketed_manifest pattern).
* ``incremental_near_dup_pairs`` — near-dup pairs touching the new
  batch: candidates = new buckets ⋈ landed buckets on (band, key), with
  the new side BROADCAST when it is batch-sized, so the landed index is
  never shuffled; plus the within-batch self-join.  Exact-Jaccard
  verification then fetches ONLY the candidate corpus docs' text (a
  semi-join by doc_id — selective IO, pruned further if the corpus is a
  landed table), never the whole corpus.  Results are value-identical
  to minhash_lsh_pairs over (corpus ∪ batch) restricted to pairs
  touching the batch — pinned by tests/test_dedup_index.py, with and
  without the hot-bucket cap.

Deliberate contract limits, stated loudly:

* ``max_df`` (the stopword-shingle cap) is NOT supported here: document
  frequency is a corpus-GLOBAL statistic, so capping under growth would
  silently change the signatures of already-landed docs — DF-capped
  dedup is a full-rebuild operation, like re-training IVF centroids
  (operators/simsearch.py).  land refuses max_df by omission: the index
  always holds uncapped signatures; ``max_bucket`` (a query-time knob
  over bucket occupancy, which the committed counts track exactly)
  covers the degenerate-bucket blowup instead.
* Appends are batch ops with the loud-staleness discipline, not
  exactly-once streaming: the data append and the counts commit are two
  operations, so every query cross-checks the committed counts' total
  row count against the bucket table's (a parquet-footer count, no data
  read) and refuses a torn index.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.dedup import shingles
from distributed_spatial_index_spark.sources.metastore import (
    meta_commit,
    meta_read,
)

_SPEC_FILE = "_spec"
_BUCKETS_DIR = "buckets"


def _root(path: str) -> str:
    from distributed_spatial_index_spark.sources.metastore import _root

    return _root(path)


def _band_buckets(
    docs: DataFrame, n_hashes: int, bands: int, n: int, text_col: str
) -> DataFrame:
    """(doc_id, band, key): the LSH band buckets of ``docs`` — the same
    shingle -> minhash -> band pipeline as minhash_lsh_pairs, kept in
    lockstep by test_incremental_equals_full_recompute (any drift breaks
    value-equality with the full-corpus op)."""
    rows = n_hashes // bands
    sh = shingles(docs, n, text_col)
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins).select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"),
    )
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(
                *[F.element_at("sig", bi * rows + ri + 1) for ri in range(rows)]
            ).alias("key"),
        )
        for bi in range(bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def _read_spec(path: str) -> dict:
    try:
        with open(os.path.join(_root(path), _SPEC_FILE)) as f:
            return json.load(f)
    except FileNotFoundError as exc:
        raise ValueError(
            f"{path} carries no {_SPEC_FILE} file — not a landed minhash "
            "index; build it with land_minhash_index"
        ) from exc


def _write_spec(path: str, spec: dict) -> None:
    target = os.path.join(_root(path), _SPEC_FILE)
    tmp = f"{target}.tmp"
    with open(tmp, "w") as f:
        json.dump(spec, f)
    os.replace(tmp, target)


def _commit_counts(path: str, buckets: DataFrame) -> None:
    counts = buckets.groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("n")
    )
    meta_commit(path, {"bucket_counts": counts.coalesce(1)})


def land_minhash_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    n_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
) -> None:
    """Build the landed index at ``path`` from one corpus scan: bucket
    rows under ``buckets/``, parameters in ``_spec``, per-bucket counts
    as committed metadata.  Overwrites any previous index at the path
    (a rebuild — the append path is append_minhash_index)."""
    if n_hashes % bands:
        raise ValueError(f"bands={bands} must divide n_hashes={n_hashes}")
    bk = _band_buckets(docs, n_hashes, bands, n, text_col)
    bk.write.mode("overwrite").parquet(
        os.path.join(_root(path), _BUCKETS_DIR)
    )
    landed = _buckets_table(spark, path)
    _commit_counts(path, landed)
    _write_spec(
        path,
        {
            "n_hashes": n_hashes,
            "bands": bands,
            "n": n,
            "text_col": text_col,
            "n_bucket_rows": landed.count(),
        },
    )


def _buckets_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(_root(path), _BUCKETS_DIR))


def _check_fresh(spark: SparkSession, path: str, spec: dict) -> DataFrame:
    """The landed bucket table, refused loudly when its row count
    disagrees with the spec (a data append whose spec/counts commit never
    landed — the torn-index window the module docstring discloses).  The
    count is parquet-footer metadata, no data read."""
    landed = _buckets_table(spark, path)
    n = landed.count()
    if n != spec["n_bucket_rows"]:
        raise ValueError(
            f"minhash index at {path} is torn: bucket table holds {n} "
            f"rows but the spec records {spec['n_bucket_rows']} — a data "
            "append ran without its counts/spec commit; re-run "
            "append_minhash_index's repair (re-land the index)"
        )
    return landed


def _refuse_id_collision(
    landed: DataFrame, docs_new: DataFrame, path: str, op: str
) -> None:
    """A batch doc_id already present in the index would double-count its
    buckets (append) or emit self-pairs and mispair against its index
    twin (query) — both silent wrong answers, so both entry points pay
    one index-column scan to refuse it loudly."""
    dup = (
        landed.join(
            F.broadcast(docs_new.select("doc_id").distinct()), "doc_id"
        )
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            f"{op}: batch doc_id(s) already present in the index at "
            f"{path} — doc ids must be unique across the corpus"
        )


def append_minhash_index(
    spark: SparkSession, docs_new: DataFrame, path: str
) -> int:
    """Append a new batch's bucket rows and merge its counts into a new
    committed metadata version.  Cost ∝ the batch (one batch scan + one
    metadata-scale counts merge), not the corpus.  Returns the number of
    bucket rows appended.  Refuses doc_ids already in the index (an id
    collision would double-count its buckets and emit self-pairs)."""
    spec = _read_spec(path)
    landed = _check_fresh(spark, path, spec)
    _refuse_id_collision(landed, docs_new, path, "append_minhash_index")
    bk = _band_buckets(
        docs_new, spec["n_hashes"], spec["bands"], spec["n"],
        spec["text_col"],
    ).persist()
    n_new = bk.count()
    bk.write.mode("append").parquet(os.path.join(_root(path), _BUCKETS_DIR))
    merged = (
        meta_read(spark, path, "bucket_counts")
        .unionByName(bk.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n")))
        .groupBy("band", "key")
        .agg(F.sum("n").alias("n"))
    )
    meta_commit(path, {"bucket_counts": merged.coalesce(1)})
    spec["n_bucket_rows"] += n_new
    _write_spec(path, spec)
    bk.unpersist()
    return n_new


def incremental_near_dup_pairs(
    spark: SparkSession,
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    path: str,
    threshold: float = 0.7,
    max_bucket: int | None = None,
    broadcast_rows: int = 500_000,
) -> DataFrame:
    """(a, b, jaccard): near-dup pairs with AT LEAST ONE side in
    ``new_docs`` — batch↔corpus plus batch↔batch — value-identical to
    ``minhash_lsh_pairs(corpus ∪ batch)`` restricted to those pairs, at
    the cost of the batch, not the corpus:

    * candidates: the batch's bucket rows (computed from ``new_docs``,
      BROADCAST when the batch is under ``broadcast_rows`` bucket rows)
      equi-join the landed bucket table — the index streams through the
      join, the corpus text is untouched;
    * ``max_bucket``: hot buckets are dropped by their occupancy over
      corpus+batch, read from the COMMITTED counts merged with the
      batch's own (metadata-scale — the same numbers a full-corpus run's
      window count would see, which is what keeps this value-identical
      to the full recompute);
    * verification: exact shingle Jaccard over ONLY the docs appearing
      in some candidate pair — corpus text is fetched by a semi-join on
      doc_id (selective IO; a landed corpus table prunes further).

    ``corpus_docs`` must be the corpus the index was built over (the
    text source for verification); the index itself never stores text.
    The new batch is NOT appended — call append_minhash_index after the
    batch is accepted, keeping detect and ingest separate."""
    spec = _read_spec(path)
    landed = _check_fresh(spark, path, spec)
    _refuse_id_collision(
        landed, new_docs, path, "incremental_near_dup_pairs"
    )
    new_bk = _band_buckets(
        new_docs, spec["n_hashes"], spec["bands"], spec["n"],
        spec["text_col"],
    )
    # both the old↔new join side and the counts merge read this
    # batch-sized frame: materialize once (the minhash_lsh_pairs lazy-
    # checkpoint pattern)
    new_bk = new_bk.localCheckpoint(eager=False)

    if max_bucket is not None:
        merged = (
            meta_read(spark, path, "bucket_counts")
            .unionByName(
                new_bk.groupBy("band", "key").agg(
                    F.count(F.lit(1)).alias("n")
                )
            )
            .groupBy("band", "key")
            .agg(F.sum("n").alias("n"))
        )
        hot = merged.filter(F.col("n") > max_bucket).select("band", "key")
        # occupancy over corpus+batch == the full recompute's window
        # count, so dropping these buckets from BOTH sides reproduces
        # _cap_buckets' decisions exactly
        landed = landed.join(F.broadcast(hot), ["band", "key"], "left_anti")
        new_bk = new_bk.join(F.broadcast(hot), ["band", "key"], "left_anti")

    nb = new_bk.alias("nb")
    small = new_bk.count() <= broadcast_rows
    probe = F.broadcast(nb) if small else nb
    cand_on = (
        landed.alias("lb")
        .join(probe, ["band", "key"])
        .select(
            F.least(F.col("lb.doc_id"), F.col("nb.doc_id")).alias("a"),
            F.greatest(F.col("lb.doc_id"), F.col("nb.doc_id")).alias("b"),
        )
    )
    a2 = new_bk.alias("x")
    b2 = new_bk.alias("y")
    cand_nn = (
        a2.join(b2, ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    cand = cand_on.unionByName(cand_nn).dropDuplicates(["a", "b"])

    # exact verify over only the docs some candidate names: corpus text
    # via a selective semi-join, batch text directly
    cand_ids = (
        cand.select(F.col("a").alias("doc_id"))
        .unionByName(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    tc = spec["text_col"]
    needed = (
        corpus_docs.select("doc_id", tc)
        .join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .unionByName(new_docs.select("doc_id", tc))
    )
    sh = shingles(needed, spec["n"], tc).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cand.join(sha, "a").join(shb, ["b", "shingle"])
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    out = (
        inter.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")),
            "a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")),
            "b",
        )
        .select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= F.lit(threshold))
    )
    # answer-sized: materialize so the candidate-shingle cache is released
    # before returning (minhash_lsh_pairs' discipline)
    out = out.persist()
    try:
        out.count()
    finally:
        sh.unpersist()  # release even when the count raises
    out.index_stats = {
        "new_bucket_rows_broadcast": small,
        "max_bucket": max_bucket,
    }
    return out
