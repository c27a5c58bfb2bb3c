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

Exactly-once: foreachBatch is an AT-LEAST-ONCE contract — after a crash
Spark re-delivers the last in-flight batch — so a bare INSERT INTO would
duplicate that batch's rows.  The guard here is the same idempotent-
commit pattern Delta exposes as (txnAppId, txnVersion) and Iceberg
carries in its snapshot summary: a ``_stream_commit`` marker at the
table path records (ingest_id, batch_id) of the last landed batch,
written via temp-file + atomic rename AFTER the insert; a re-delivered
(same ingest_id, batch_id <= committed) batch is skipped.  ingest_id
derives from the checkpoint location because that is exactly the domain
in which Spark's batch ids are monotonic — a NEW checkpoint restarts
ids at 0 and must NOT be skipped.  Residual honesty: insert and marker
are two operations, so a crash BETWEEN them still duplicates that one
batch on restart — closing that window needs the table format's atomic
snapshot commit (data files + summary in one swap), which is precisely
what this layout stands in for.  Single concurrent writer assumed, as
in the table formats' default streaming-ingest topology.

What this deliberately does NOT hide: each micro-batch appends up to
n_buckets files per touched hive partition, so long streams need
compaction (Iceberg's rewrite_data_files) — plans/bucketing.py's
compact_bucketed_table is the stand-in and carries the commit marker
across the swap.  At the 100-TB design point the same structure holds
with a table format doing snapshot commits instead of catalog INSERTs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
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
from distributed_spatial_index_spark.sources.metastore import meta_vacuum

_COMMIT_FILE = "_stream_commit"


def _commit_file(path: str) -> str:
    from distributed_spatial_index_spark.sources.layout import _local_root

    root = _local_root(path)
    if root is None:
        raise NotImplementedError(
            "stream_land_points' idempotent-commit marker is the local-"
            "filesystem stand-in for a table format's atomic snapshot "
            "commit; land non-local paths through Iceberg/Delta"
        )
    return os.path.join(root, _COMMIT_FILE)


def read_stream_commit(path: str) -> tuple[str, int] | None:
    """(ingest_id, batch_id) of the last landed batch, or None."""
    try:
        with open(_commit_file(path)) as f:
            d = json.load(f)
        return d["ingest_id"], int(d["batch_id"])
    except FileNotFoundError:
        return None


def write_stream_commit(path: str, ingest_id: str, batch_id: int) -> None:
    """Record the landed batch via temp-file + atomic rename (POSIX
    rename is atomic on one filesystem, so readers see old-or-new,
    never a torn marker)."""
    target = _commit_file(path)
    tmp = f"{target}.tmp"
    with open(tmp, "w") as f:
        json.dump({"ingest_id": ingest_id, "batch_id": batch_id}, f)
    os.replace(tmp, target)


def make_land_fn(
    table: str,
    path: str,
    ingest_id: str,
    n_buckets: int = 32,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    coarse_bits: int | None = None,
    with_manifest: bool = True,
    meta_keep: int = 4,
):
    """The foreachBatch body, exposed so tests can drive the at-least-
    once contract directly (re-deliver a batch id, switch ingest ids).

    ``meta_keep``: every manifested micro-batch commits one new metadata
    version (sources/metastore.py), so a long stream would otherwise
    accumulate one version dir per batch — unbounded metadata debt.
    Each batch therefore vacuums down to the newest ``meta_keep``
    versions, which bounds the debt while still giving concurrent
    readers ``meta_keep - 1`` whole micro-batch intervals to finish
    against the version they resolved (Iceberg's snapshot-expiration
    retention knob, applied per commit)."""

    def land(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if not spark.catalog.tableExists(table):
            write_bucketed_points(
                batch, table, path, n_buckets=n_buckets, bits=bits,
                region=region, coarse_bits=coarse_bits,
            )
            if with_manifest:
                write_bucketed_manifest(spark, table)
            write_stream_commit(path, ingest_id, batch_id)
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

        # the marker follows the table across a compaction swap: read and
        # write it at the CURRENT dsi.path, not the stream's original arg
        marker_path = spec.get("dsi.path", path)
        committed = read_stream_commit(marker_path)
        if (
            committed is not None
            and committed[0] == ingest_id
            and batch_id <= committed[1]
        ):
            return  # at-least-once re-delivery of a landed batch

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
            meta_vacuum(marker_path, keep=meta_keep)
        write_stream_commit(marker_path, ingest_id, batch_id)

    return land


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
    meta_keep: int = 4,
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
    Batches re-delivered after a crash are skipped via the
    ``_stream_commit`` marker (module docstring: the Delta
    txnAppId/txnVersion pattern; ingest_id = the checkpoint location,
    the domain in which Spark's batch ids are monotonic).

    Salted specs are refused: the salt requires the ingest-time hot-cell
    list, and a stream's hot set drifts — re-land batch-wise when skew
    handling is needed.  File-count growth is the stream's compaction
    debt; compact_bucketed_table pays it down exactly as a table format
    would."""
    from distributed_spatial_index_spark.sources.layout import _local_root

    ingest_id = _local_root(checkpoint_dir) or checkpoint_dir
    return (
        point_stream.writeStream.foreachBatch(
            make_land_fn(
                table, path, ingest_id, n_buckets=n_buckets, bits=bits,
                region=region, coarse_bits=coarse_bits,
                with_manifest=with_manifest, meta_keep=meta_keep,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
