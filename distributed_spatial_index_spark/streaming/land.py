"""Streaming ingest INTO the landed bucketed layout.

Rounds 4-5 built the landed serving layer (plans/bucketing.py: bucket
spec -> Exchange-free joins; manifest/density -> pruning + knn_landed)
with batch ingest.  The reference is a streaming system, so the layout
must also be MAINTAINABLE under continuous arrival: this module lands a
point stream into the same unified layout with `foreachBatch` — batch 0
creates the table through the ordinary batch writer (one code path for
the layout invariants), every later micro-batch appends through the
table (`INSERT INTO`, which Spark routes through the bucket spec so the
files keep the bucket-parity contract) and repairs the metadata
INCREMENTALLY (update_bucketed_manifest scans only the appended files).
The landed table is therefore query-consistent at every batch boundary:
bucketed_point_range_join / pruned joins / knn_landed serve it with no
staleness error mid-stream.

What this deliberately does NOT hide: each micro-batch appends up to
n_buckets files per touched hive partition, so long streams need
compaction (Iceberg's rewrite_data_files) — the parquet stand-in's
answer is periodic re-landing via write_bucketed_points; the docstring
of stream_land_points names the knob.  At the 100-TB design point the
same structure holds with a table format doing snapshot commits instead
of catalog INSERTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from distributed_spatial_index_spark.config import (
    DEFAULT_REGION,
    JOIN_BITS,
    Region,
)
from distributed_spatial_index_spark.plans.bucketing import (
    update_bucketed_manifest,
    write_bucketed_manifest,
    write_bucketed_points,
)


def stream_land_points(
    point_stream: DataFrame,
    table: str,
    path: str,
    checkpoint_dir: str,
    n_buckets: int = 32,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    coarse_bits: int | None = None,
    with_manifest: bool = True,
) -> StreamingQuery:
    """Land ``point_stream`` (id, x, y, ...) into the unified bucketed
    layout continuously.  Returns the started StreamingQuery (caller
    awaits/stops it).

    Batch 0 goes through write_bucketed_points — the SAME writer batch
    ingest uses, so every layout invariant (bucket spec, sortBy
    clustering, pcell partitioning, TBLPROPERTIES) has one
    implementation.  Later batches `INSERT INTO` the catalog table
    (Spark's bucketed insert keeps the bucket-file contract — verified
    by the manifest's bucket-hash-vs-filename parity check) and then
    incrementally manifest ONLY the new files, so the landed metadata
    (pruning stats, knn density) stays fresh at every batch boundary.

    Salted specs are refused: the salt requires the ingest-time hot-cell
    list, and a stream's hot set drifts — re-land batch-wise when skew
    handling is needed.  File-count growth is the stream's compaction
    debt; re-land periodically (write_bucketed_points over the table)
    exactly as a table format would compact."""

    def land(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if not spark.catalog.tableExists(table):
            write_bucketed_points(
                batch, table, path, n_buckets=n_buckets, bits=bits,
                region=region, coarse_bits=coarse_bits,
            )
            if with_manifest:
                write_bucketed_manifest(spark, table)
            return
        from pyspark.sql import functions as F

        from distributed_spatial_index_spark.functions.cells import (
            cell_id_col,
        )
        from distributed_spatial_index_spark.plans.bucketing import (
            _get_spec,
            _region_fingerprint,
        )

        # loud on restart-against-a-different-layout: appending cells
        # derived with other bits/region/coarse_bits would silently
        # corrupt the table (same discipline as the landed readers)
        spec = _get_spec(spark, table)
        want = {
            "dsi.bits": str(bits),
            "dsi.region": _region_fingerprint(region),
            "dsi.kind": "points",
            "dsi.salted": "0",
        }
        if coarse_bits is not None:
            want["dsi.coarse_bits"] = str(coarse_bits)
        bad = {
            k: (spec.get(k), v) for k, v in want.items() if spec.get(k) != v
        }
        if bad or ("dsi.coarse_bits" in spec) != (coarse_bits is not None):
            raise ValueError(
                f"stream_land_points: existing table {table} was landed "
                f"with a different layout than the stream's arguments "
                f"(mismatches: {bad or 'coarse_bits presence'}) — "
                "appending would corrupt it"
            )

        df = batch.withColumn(
            "cell", cell_id_col(F.col("x"), F.col("y"), bits, region)
        )
        if coarse_bits is not None:
            df = df.withColumn(
                "pcell",
                F.shiftright(F.col("cell"), 2 * (bits - coarse_bits)),
            )
        # insertInto matches by POSITION: order columns as the table does
        df.select(*spark.table(table).columns).write.insertInto(table)
        if with_manifest:
            update_bucketed_manifest(spark, table)

    return (
        point_stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
