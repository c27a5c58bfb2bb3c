"""Deterministic interleaved text+media documents (BASELINE.json input_hint):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Built as pure column expressions over any integer-id table (the driver's
``documents.parquet`` by default, reusing its real text for text spans), so
it distributes trivially and a DuckDB oracle can recompute every derived
quantity from doc_id arithmetic without touching arrays or strings.

Layout for doc with integer id D:
  m       = 1 + (D * 2654435761) % 8          spans per doc (1..8)
  span j  (0 <= j < m):
    kind      = "media" if j odd else "text"  (interleaved; m==1 -> text-only)
    offset    = j
    text span : text = 16-char slice of the doc's source text, media_ref null
    media span: text = "", media_ref = "geo:x,y" for a point, or
                "geo:x,y,x2,y2" for a segment when sid % 3 == 0, where
                sid = D*8 + j, (x, y) = derive(sid), (x2, y2) = derive(sid +
                SEG_OFFSET); coordinates are %.5f-formatted (FIXTURES.md §1)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_spatial_index_spark.functions import geo_derive as gd
from distributed_spatial_index_spark.sources import tables as src

SPAN_MUL = 2654435761  # Knuth multiplicative hash constant
MAX_SPANS = 8
SEG_OFFSET = 500009    # second-endpoint id displacement for segment spans
SEG_MOD = 3            # every 3rd media span is a segment


def n_spans_col(d: Column) -> Column:
    return (F.lit(1) + (d * F.lit(SPAN_MUL)) % F.lit(MAX_SPANS)).cast("int")


def n_spans_sql(d: str) -> str:
    return f"(1 + (CAST(({d}) AS BIGINT) * {SPAN_MUL}) % {MAX_SPANS})"


def _fmt5(c: Column) -> Column:
    return F.format_string("%.5f", c)


SEG_HALF = 50.0  # max |offset| of a segment's second endpoint (local
                 # segments, like the reference's maxSegment=400 bound)


def _media_ref(sid: Column) -> Column:
    xc = gd.derive_x_col(sid)
    yc = gd.derive_y_col(sid)
    x = _fmt5(xc)
    y = _fmt5(yc)
    sid2 = sid + F.lit(SEG_OFFSET)
    # second endpoint = first + a small deterministic offset in
    # [-SEG_HALF, SEG_HALF): segments stay local, so their MBRs cover a
    # bounded number of routing cells
    ux2 = ((sid2 * F.lit(gd.A_X) + F.lit(gd.C_X)) % F.lit(gd.M)) / F.lit(gd.M)
    uy2 = ((sid2 * F.lit(gd.A_Y) + F.lit(gd.C_Y)) % F.lit(gd.M)) / F.lit(gd.M)
    x2 = _fmt5(xc + (ux2 * F.lit(2 * SEG_HALF) - F.lit(SEG_HALF)))
    y2 = _fmt5(yc + (uy2 * F.lit(2 * SEG_HALF) - F.lit(SEG_HALF)))
    return F.when(
        sid % SEG_MOD == 0,
        F.concat(F.lit("geo:"), x, F.lit(","), y, F.lit(","), x2, F.lit(","), y2),
    ).otherwise(F.concat(F.lit("geo:"), x, F.lit(","), y))


def interleaved_documents(
    spark: SparkSession, sf_dir: str, table: str = "documents"
) -> DataFrame:
    """Build the input_hint table from the driver's documents parquet,
    deterministically (doc_id -> spans); text spans slice the real text."""
    base = src.load(spark, sf_dir, table).select(
        F.col("doc_id").cast("long").alias("d"), F.col("text").alias("src_text")
    )
    d = F.col("d")

    def make_span(j: Column) -> Column:
        sid = d * MAX_SPANS + j
        is_media = (j % 2) == 1
        return F.struct(
            F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.when(is_media, F.lit(""))
            .otherwise(F.substring(F.col("src_text"), 1, 16))
            .alias("text"),
            F.when(is_media, _media_ref(sid)).otherwise(F.lit(None).cast("string"))
            .alias("media_ref"),
            j.cast("int").alias("offset"),
        )

    spans = F.transform(
        F.sequence(F.lit(0).cast("long"), (n_spans_col(d) - 1).cast("long")),
        make_span,
    )
    return base.select(
        d.cast("string").alias("doc_id"), spans.alias("spans")
    )


def media_spans_sql(table: str = "documents") -> str:
    """DuckDB oracle for the media spans of interleaved_documents, computed
    from doc_id arithmetic alone (no arrays/strings except the %.5f
    round-trip, which matches Java's format exactly for non-midpoint
    doubles): (doc_id, offset, xmin, ymin, xmax, ymax, is_segment)."""
    sid = "(CAST(d AS BIGINT) * 8 + j)"
    sid2 = f"({sid} + {SEG_OFFSET})"

    def rt(expr: str) -> str:  # %.5f round-trip
        return f"CAST(printf('%.5f', {expr}) AS DOUBLE)"

    x, y = rt(gd.derive_x_sql(sid)), rt(gd.derive_y_sql(sid))
    ux2 = f"(((({sid2}) * {gd.A_X} + {gd.C_X}) % {gd.M}) / {gd.M})"
    uy2 = f"(((({sid2}) * {gd.A_Y} + {gd.C_Y}) % {gd.M}) / {gd.M})"
    x2raw = f"({gd.derive_x_sql(sid)} + ({ux2} * {2 * SEG_HALF!r} - {SEG_HALF!r}))"
    y2raw = f"({gd.derive_y_sql(sid)} + ({uy2} * {2 * SEG_HALF!r} - {SEG_HALF!r}))"
    x2 = f"(CASE WHEN {sid} % {SEG_MOD} = 0 THEN {rt(x2raw)} ELSE {x} END)"
    y2 = f"(CASE WHEN {sid} % {SEG_MOD} = 0 THEN {rt(y2raw)} ELSE {y} END)"
    return f"""
        SELECT CAST(d AS VARCHAR) AS doc_id,
               CAST(j AS INT) AS offset,
               least({x}, {x2}) AS xmin, least({y}, {y2}) AS ymin,
               greatest({x}, {x2}) AS xmax, greatest({y}, {y2}) AS ymax,
               ({sid} % {SEG_MOD} = 0) AS is_segment
        FROM (SELECT doc_id AS d, j
              FROM {table}, range({MAX_SPANS}) t(j)
              WHERE j < {n_spans_sql('doc_id')} AND j % 2 = 1)
    """
