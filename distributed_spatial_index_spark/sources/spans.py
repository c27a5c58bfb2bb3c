"""Span extraction + the per-row span-sequence invariant (input_hint).

Geometry extraction parses ``media_ref`` strings ("geo:x,y[,x2,y2]") into
per-span MBRs with pure column ops (split + cast; no Python), the engine's
replacement for the reference's string->TrackPoint constructor parsing
(TrackPoint.java:25-32) over interleaved payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_geo(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans) -> one row per media span:
    (doc_id, offset, xmin, ymin, xmax, ymax, is_segment).

    Span order survives via the struct's own ``offset`` field — explode
    order is irrelevant, so this is shuffle-agnostic.
    """
    s = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            F.split(F.substring(F.col("s.media_ref"), 5, 2_147_483_000), ",").alias("c"),
        )
    )
    x = F.element_at("c", 1).cast("double")
    y = F.element_at("c", 2).cast("double")
    seg = F.size("c") == 4
    x2 = F.when(seg, F.element_at("c", 3).cast("double")).otherwise(x)
    y2 = F.when(seg, F.element_at("c", 4).cast("double")).otherwise(y)
    return s.select(
        "doc_id",
        "offset",
        F.least(x, x2).alias("xmin"),
        F.least(y, y2).alias("ymin"),
        F.greatest(x, x2).alias("xmax"),
        F.greatest(y, y2).alias("ymax"),
        seg.alias("is_segment"),
    )


def span_signature(docs: DataFrame) -> DataFrame:
    """Canonical (kind, text, media_ref, order) sequence per doc: the
    invariant tuple of FIXTURES.md §1.  Spans are sorted by offset so the
    signature is insensitive to any array reordering an operator might do."""
    sig = F.transform(
        F.array_sort(
            F.col("spans"),
            lambda a, b: F.when(a["offset"] < b["offset"], -1)
            .when(a["offset"] > b["offset"], 1)
            .otherwise(0),
        ),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return docs.select("doc_id", sig.alias("span_sig"))


def span_sequence_violations(surviving: DataFrame, source: DataFrame) -> int:
    """Count surviving docs whose span sequence differs from the input —
    must be 0 after every pipeline (per-row invariant, BASELINE.json)."""
    a = span_signature(surviving).alias("a")
    b = span_signature(source).alias("b")
    joined = a.join(b, "doc_id", "left")
    return joined.filter(
        F.col("b.span_sig").isNull()
        | (F.col("a.span_sig") != F.col("b.span_sig"))
    ).count()
