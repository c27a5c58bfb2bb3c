"""Interleaved-document generation, span extraction, span-sequence invariant
(input_hint / FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.range_join import mbr_range_join
from distributed_spatial_index_spark.sources import tables as src
from distributed_spatial_index_spark.sources.spans import (
    extract_geo,
    span_sequence_violations,
)
from distributed_spatial_index_spark.sources.synthetic import (
    MAX_SPANS,
    SEG_MOD,
    interleaved_documents,
)
from tests.conftest import SF_DIR


def test_schema_matches_input_hint(spark):
    docs = interleaved_documents(spark, SF_DIR)
    assert docs.schema.simpleString() == (
        "struct<doc_id:string,spans:array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>>"
    )


def test_span_layout(spark):
    docs = interleaved_documents(spark, SF_DIR)
    rows = docs.collect()
    assert len(rows) == 500
    seen_media = seen_segment = 0
    for r in rows:
        spans = r["spans"]
        assert 1 <= len(spans) <= MAX_SPANS
        for j, s in enumerate(spans):
            assert s["offset"] == j
            if j % 2 == 1:
                assert s["kind"] == "media" and s["media_ref"].startswith("geo:")
                parts = s["media_ref"][4:].split(",")
                assert len(parts) in (2, 4)
                sid = int(r["doc_id"]) * MAX_SPANS + j
                assert (len(parts) == 4) == (sid % SEG_MOD == 0)
                seen_media += 1
                seen_segment += len(parts) == 4
            else:
                assert s["kind"] == "text" and s["media_ref"] is None
    assert seen_media > 0 and seen_segment > 0


def test_extract_geo_roundtrip(spark):
    docs = interleaved_documents(spark, SF_DIR)
    geo = extract_geo(docs)
    rows = geo.collect()
    # every media span surfaced exactly once
    n_media = docs.select(
        F.explode("spans").alias("s")).filter(F.col("s.kind") == "media").count()
    assert len(rows) == n_media
    for r in rows:
        assert r["xmin"] <= r["xmax"] and r["ymin"] <= r["ymax"]
        if not r["is_segment"]:
            assert r["xmin"] == r["xmax"] and r["ymin"] == r["ymax"]


def test_span_sequence_invariant_through_pipeline(spark):
    """Surviving documents of a spatial pipeline keep their exact span
    sequence (the per-row invariant every test must check)."""
    docs = interleaved_documents(spark, SF_DIR)
    geo = extract_geo(docs)
    mbrs = geo.select(F.col("doc_id").cast("long").alias("id"),
                      "xmin", "ymin", "xmax", "ymax")
    qs = src.range_queries(spark, SF_DIR, "documents")
    hits = mbr_range_join(mbrs, qs)
    surviving = docs.join(
        hits.select(F.col("doc_id").cast("string").alias("doc_id")).distinct(),
        "doc_id",
    )
    assert surviving.count() > 0
    assert span_sequence_violations(surviving, docs) == 0


def test_span_sequence_violation_detected(spark):
    docs = interleaved_documents(spark, SF_DIR)
    # corrupt one doc's first span text
    corrupted = docs.withColumn(
        "spans",
        F.when(
            F.col("doc_id") == "7",
            F.transform("spans", lambda s: F.struct(
                s["kind"].alias("kind"),
                F.lit("CORRUPT").alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            )),
        ).otherwise(F.col("spans")),
    )
    assert span_sequence_violations(corrupted, docs) == 1
