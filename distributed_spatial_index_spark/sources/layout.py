"""Cell-partitioned storage layout: spatial partition pruning at the scan.

The reference prunes by routing through its in-memory GTree
(GTree.java:395-407); a table engine gets the same effect from LAYOUT: write
the doc table hive-partitioned by the coarse Morton cell (and range-sorted
by the fine cell within partitions), and any query whose coarse cells are
known prunes whole directories before a byte is read — Catalyst shows them
under PartitionFilters.  On Iceberg the same write becomes
``writeTo(...).partitionedBy(...)`` with cell-range metadata pruning; this
module is the parquet-fallback shape of that layout.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import (
    COARSE_BITS,
    DEFAULT_REGION,
    EPSILON,
    JOIN_BITS,
    Region,
)
from distributed_spatial_index_spark.functions.cells import (
    cell_coord_np,
    cell_id_col,
    covering_cells_col,
    morton_np,
)
from distributed_spatial_index_spark.operators.range_join import point_range_join


def write_cell_layout(
    points: DataFrame,
    path: str,
    coarse_bits: int = COARSE_BITS,
    fine_bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
) -> None:
    """points(id, x, y, ...) -> parquet partitioned by coarse cell, rows
    range-clustered by fine cell inside each partition (so row-group stats
    also prune within a partition)."""
    df = points.withColumn(
        "pcell", cell_id_col(F.col("x"), F.col("y"), coarse_bits, region)
    ).withColumn(
        "fcell", cell_id_col(F.col("x"), F.col("y"), fine_bits, region)
    )
    (
        df.repartitionByRange(F.col("pcell"), F.col("fcell"))
        .sortWithinPartitions("pcell", "fcell")
        .write.mode("overwrite")
        .partitionBy("pcell")
        .parquet(path)
    )


def read_cell_layout(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# --- Iceberg-shaped manifest pruning (SURVEY.md §7.2 step 9) -----------------
#
# Iceberg prunes at two metadata levels before touching data: partition
# values (directory-equivalent) and per-FILE column min/max stats from the
# manifest.  The sandbox has no Iceberg jars, so this is the parquet
# stand-in with the same architecture: a committed manifest table holding
# per-file (pcell, fcell_min, fcell_max, n_rows), consulted BEFORE the scan
# to hand Spark only the files whose fine-cell range can matter.  Because
# write_cell_layout clusters rows by fcell within partitions, file-level
# Morton ranges are tight and selective queries skip most files of even a
# hot partition — the level directory pruning alone cannot reach.


def write_manifest(spark: SparkSession, path: str) -> None:
    """Build the per-file manifest for a write_cell_layout table: one scan
    of the layout's fcell column grouped by ``_metadata.file_path`` (the
    stand-in for Iceberg reading parquet footer stats at commit time);
    committed atomically under ``<path>/_meta`` via the versioned
    metadata pointer (sources/metastore.py)."""
    from distributed_spatial_index_spark.sources.metastore import meta_commit

    df = spark.read.parquet(path)
    man = (
        df.groupBy(
            F.col("_metadata.file_path").alias("file_path"), F.col("pcell")
        )
        .agg(
            F.min("fcell").alias("fcell_min"),
            F.max("fcell").alias("fcell_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .coalesce(1)
    )
    meta_commit(path, {"manifest": man})


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    from distributed_spatial_index_spark.sources.metastore import meta_read

    return meta_read(spark, path, "manifest")


def _norm_file_path(p: str) -> str:
    """Scheme-insensitive file identity: Hadoop listings say
    ``file:/x/y``, ``_metadata.file_path`` says ``file:///x/y`` — strip
    scheme and leading slashes so the two spellings compare equal."""
    if ":" in p.split("/", 1)[0]:
        p = p.split(":", 1)[1]
    return p.lstrip("/")


def _local_root(path: str) -> str | None:
    """``/x``, ``file:/x``, ``file:///x`` -> the local filesystem path;
    None for any other scheme (callers fall back to the Hadoop FS API)."""
    scheme = path.split(":", 1)[0] if ":" in path.split("/", 1)[0] else ""
    if scheme not in ("", "file"):
        return None
    import os

    root = path.split(":", 1)[1] if scheme else path
    while root.startswith("//"):  # file:///x and file://x -> /x
        root = root[1:]
    return os.path.abspath(root)


def list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Recursive listing of the layout's DATA files (pure metadata op — no
    file is opened): every ``*.parquet`` whose path has no
    underscore-prefixed segment (``_meta``, ``_SUCCESS``, ``_spec`` are
    metadata,
    exactly the files a Spark scan would skip).

    Local paths walk in-process: the Hadoop ``listFiles`` iterator costs
    ~3 py4j round-trips PER FILE (~3 s over a 512-file table — measured;
    it dominated knn_landed before this fast path).  Remote schemes keep
    the Hadoop iterator, where the per-file cost is the object store's,
    not py4j's; a real table format (Iceberg/Delta) replaces freshness
    listings with a snapshot pointer, which is the 100-TB design — this
    listing is the parquet stand-in's witness."""
    root = _local_root(path)
    if root is not None:
        import os

        out = []
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [
                d for d in dirnames if not d.startswith(("_", "."))
            ]
            for f in filenames:
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    out.append(
                        _norm_file_path(os.path.join(dirpath, f))
                    )
        return sorted(out)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    base = _norm_file_path(fs.makeQualified(hpath).toString())
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        p = _norm_file_path(it.next().getPath().toString())
        rel = p[len(base):].lstrip("/")
        if not p.endswith(".parquet"):
            continue
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
            continue
        out.append(p)
    return sorted(out)


def distributed_covering_cells(
    queries: DataFrame,
    bits: int,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """DISTINCT cell ids (column ``c``) covered by any query rect at
    ``bits``, derived DISTRIBUTED (explode per query, distinct) — the ONE
    derivation behind pruned_point_range_join, manifest_select_files, and
    the NumPy-oracle test, so the prune predicate cannot drift per call
    site.  Row count is bounded by 4^bits regardless of |queries|."""
    return queries.select(
        F.explode(
            covering_cells_col(
                F.col("xmin") - F.lit(eps), F.col("ymin") - F.lit(eps),
                F.col("xmax") + F.lit(eps), F.col("ymax") + F.lit(eps),
                bits=bits, region=region,
            )
        ).alias("c")
    ).distinct()


def manifest_select_files(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    fine_bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> tuple[list[str], int]:
    """(files to scan, total files in the manifest): a file survives iff
    some query's fine covering cell lands inside its [fcell_min, fcell_max]
    Morton range.  The interval join broadcasts the manifest (per-file
    rows — metadata-scale by construction) and only distinct FILE PATHS are
    collected, bounded by the file count regardless of |queries|."""
    wanted = distributed_covering_cells(queries, fine_bits, region, eps)
    # one scan of the manifest serves both the join and the total count
    man = read_manifest(spark, path).persist()
    try:
        n_total = man.count()
        # Freshness check (pure listing, no file opened): a data file the
        # manifest does not know about — e.g. appended after
        # write_manifest — would be silently never selected and its matches
        # silently dropped; raise loudly instead (full rewrites already
        # fail loudly via stale selected paths).
        known = {
            _norm_file_path(r["file_path"])
            for r in man.select("file_path").collect()
        }
        unknown = [f for f in list_data_files(spark, path) if f not in known]
        if unknown:
            raise ValueError(
                f"committed manifest of {path} is stale: "
                f"{len(unknown)} data file(s) are not in the manifest "
                f"(e.g. {unknown[0]}); re-run write_manifest after "
                "appending to the layout"
            )
        hits = (
            wanted.join(
                F.broadcast(man),
                (F.col("c") >= F.col("fcell_min"))
                & (F.col("c") <= F.col("fcell_max")),
            )
            .select("file_path")
            .distinct()
            .collect()
        )
    finally:
        man.unpersist()
    return sorted(r["file_path"] for r in hits), n_total


def manifest_pruned_point_range_join(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    fine_bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """Range join reading ONLY the manifest-selected files (file-level skip
    on top of — and finer than — the pcell directory pruning).  Results are
    identical to the unpruned join: a skipped file, by the manifest range,
    cannot contain a fine cell any query covers, and the fine-cell route
    in point_range_join only ever matches on covering cells.

    ``fine_bits`` MUST equal the ``fine_bits`` the layout was written with
    (the manifest ranges are over that cell resolution).  Scan/skip counts
    are attached to the result as ``.manifest_stats``."""
    files, n_total = manifest_select_files(
        spark, path, queries, fine_bits, region, eps
    )
    if not files:
        empty = spark.createDataFrame([], "query_id long, doc_id long")
        empty.manifest_stats = {"files_scanned": 0, "files_total": n_total}
        return empty
    # basePath keeps the hive pcell partition column when addressing leaves
    pruned = spark.read.option("basePath", path).parquet(*files)
    out = point_range_join(
        pruned.select("id", "x", "y"), queries, bits=fine_bits, region=region,
        eps=eps,
    )
    out.manifest_stats = {"files_scanned": len(files), "files_total": n_total}
    return out


def query_coarse_cells(
    queries_rows: list,
    coarse_bits: int = COARSE_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> list[int]:
    """Coarse cells overlapped by any query rect (driver-side NumPy over a
    small query list).  pruned_point_range_join derives this set
    DISTRIBUTED instead; this form remains as its independent test oracle
    (test_layout.py::test_distributed_coarse_cells_match_numpy_oracle)."""
    n = 1 << coarse_bits
    cells: set[int] = set()
    for r in queries_rows:
        x0 = int(cell_coord_np(np.array([r["xmin"] - eps]), region.x_lo, region.width, coarse_bits)[0])
        x1 = int(cell_coord_np(np.array([r["xmax"] + eps]), region.x_lo, region.width, coarse_bits)[0])
        y0 = int(cell_coord_np(np.array([r["ymin"] - eps]), region.y_lo, region.height, coarse_bits)[0])
        y1 = int(cell_coord_np(np.array([r["ymax"] + eps]), region.y_lo, region.height, coarse_bits)[0])
        cx, cy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1), indexing="ij")
        cells.update(int(c) for c in morton_np(cx.ravel(), cy.ravel(), coarse_bits))
    return sorted(cells)


def pruned_point_range_join(
    layout: DataFrame,
    queries: DataFrame,
    coarse_bits: int = COARSE_BITS,
    fine_bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
) -> DataFrame:
    """Range join over a cell-partitioned table: prune partitions by the
    queries' coarse cells first (directory-level skip), then the normal
    fine-cell route + refine.

    The coarse-cell set is derived DISTRIBUTED (distributed_covering_cells
    at coarse_bits) and only the distinct cell ids reach the driver —
    bounded by 4^coarse_bits rows regardless of |queries|, so a 10M-query
    batch never materializes on the driver.  The collected ids must then
    be a LITERAL isin: directory-level partition pruning happens at
    planning time, which a join cannot express."""
    cells = sorted(
        r["c"]
        for r in distributed_covering_cells(
            queries, coarse_bits, region, eps
        ).collect()
    )
    pruned = layout.filter(F.col("pcell").isin(cells))
    return point_range_join(
        pruned.select("id", "x", "y"), queries, bits=fine_bits, region=region,
        eps=eps,
    )
