"""Bucketed storage: the shuffle-free co-located spatial join.

The engine has three physical regimes for the cell equi-join:

- query side small  -> broadcast join, doc side never shuffles
  (operators/range_join.py);
- query side large, ad-hoc doc table -> both sides hash-shuffle on
  (cell, salt) with hot-cell salting (plans/partitioning.py) — pays a
  full shuffle of the doc side on EVERY query batch;
- query side large, doc table LANDED bucketed by cell (this module) ->
  SortMergeJoin with ZERO Exchange on the bucketed side(s): Spark reads
  each bucket as one partition, and EnsureRequirements recognizes the
  bucket spec as the join's required hash partitioning.

Skew note: bucketing moves the skew decision to INGEST — a hot cell hashes
to one bucket, buckets map 1:1 to scan partitions, and AQE's skew splitter
cannot break up a bucketed scan.  When a hot-cell list is known, write
with ``hot=``: the salt joins the bucket spec ((cell, salt)), reusing the
salting from plans/partitioning.py, and the hot cell's probe work lands in
n_salt co-located partitions with the join still Exchange-free.

At the 100-TB design point the third regime is the one that matters:
re-shuffling 100 TB per query batch is the dominant cost of the salted
plan, while bucketing pays the shuffle ONCE at ingest and amortizes it
over every subsequent batch (and over joins with OTHER tables bucketed on
the same cell key).  This is the parquet/session-catalog stand-in for an
Iceberg ``bucket(n, cell)`` partition transform — on a deployment the same
write is ``writeTo(t).partitionedBy(bucket(n, cell))`` and the bucket spec
lives in the real catalog; here ``saveAsTable`` records it in the session
catalog, which is exactly the metadata Spark's scan consults
(ref parity: the reference keeps its data co-located by keeping the
RC-trees resident per worker and migrating on map changes,
LocalTreePF.java:108-151; a storage engine gets the same co-location from
the table layout instead of resident state).

Bucket-count choice at scale: buckets are read one-per-partition (no AQE
coalesce/split inside a bucketed scan), so pick
``n_buckets ~ total_bytes / target_partition_bytes`` at ingest time —
e.g. ~100k buckets for 100 TB at 1 GiB — and keep it a multiple of the
executor count so the scan packs evenly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import (
    DEFAULT_REGION,
    EPSILON,
    JOIN_BITS,
    Region,
)
from distributed_spatial_index_spark.functions.cells import cell_id_col
from distributed_spatial_index_spark.functions.geometry import rect_contains_point
from distributed_spatial_index_spark.operators.range_join import explode_query_cells


def write_bucketed_points(
    points: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    hot: list[int] | None = None,
    n_salt: int = 8,
) -> None:
    """points(id, x, y, ...) -> parquet table bucketed AND sorted by the
    routing cell (sortBy keeps each bucket file cell-clustered, so the SMJ
    sort is cheap and row-group stats stay selective).  ``path`` makes it
    an external table: data lives there, the bucket spec in the catalog.

    ``hot``: skew handling must be decided AT INGEST for a bucketed
    layout — a hot cell hashes to ONE bucket, buckets map 1:1 to scan
    partitions, and AQE cannot split a bucketed scan; so when a hot-cell
    list is known (hot_cells_from_density over a density grid at the SAME
    ``bits`` as this write — ids from another resolution match nothing and
    the salt silently stays 0), the salt becomes part of the
    bucket spec: docs bucket on (cell, salt) and the query side duplicates
    hot rows into all n_salt sub-keys (write_bucketed_query_cells with the
    same hot list).  Results are unchanged; the hot cell's probe work
    lands in n_salt co-located partitions instead of one."""
    spark = points.sparkSession
    df = points.withColumn(
        "cell", cell_id_col(F.col("x"), F.col("y"), bits, region)
    )
    bucket_cols = ["cell"]
    if hot is not None:
        from distributed_spatial_index_spark.plans.partitioning import (
            hot_cell_lookup,
            salt_doc_side,
        )

        df = salt_doc_side(df, hot_cell_lookup(spark, hot), n_salt)
        bucket_cols = ["cell", "salt"]
    _write_bucketed(df, table, path, n_buckets, bucket_cols)
    _set_spec(spark, table, bits=bits, n_buckets=n_buckets,
              hot=hot, n_salt=n_salt, eps=None, region=region,
              kind="points")


def write_bucketed_query_cells(
    queries: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
    hot: list[int] | None = None,
    n_salt: int = 8,
) -> None:
    """queries(query_id, xmin..ymax) -> exploded (cell, query, rect) rows
    bucketed by cell with the SAME bucket count as the doc table, so the
    join needs no Exchange on either side.  This is the landed form of a
    large standing query set (the regime where broadcast is impossible).
    Pass the SAME ``hot``/``n_salt`` as the doc table's write to land the
    salted spec (hot rows duplicated into every salt sub-key)."""
    spark = queries.sparkSession
    df = explode_query_cells(queries, bits, region, eps)
    bucket_cols = ["cell"]
    if hot is not None:
        from distributed_spatial_index_spark.plans.partitioning import (
            hot_cell_lookup,
            salt_query_side,
        )

        df = salt_query_side(df, hot_cell_lookup(spark, hot), n_salt)
        bucket_cols = ["cell", "salt"]
    _write_bucketed(df, table, path, n_buckets, bucket_cols)
    _set_spec(spark, table, bits=bits, n_buckets=n_buckets,
              hot=hot, n_salt=n_salt, eps=eps, region=region,
              kind="query_cells")


def _write_bucketed(
    df: DataFrame, table: str, path: str, n_buckets: int,
    bucket_cols: list[str],
) -> None:
    """The one write pipeline both table kinds share.  The repartition on
    the bucket columns first matters: repartition's hashpartitioning is the
    same Murmur3 pmod n_buckets as the bucket spec, so each write task
    holds exactly one bucket's rows and the table lands as n_buckets files
    instead of tasks x buckets tiny ones (measured: 2049 -> 32 files at 64
    input partitions).  This IS the ingest-time shuffle the layout
    amortizes."""
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def _hot_fingerprint(hot: list[int] | None) -> str:
    if hot is None:
        return "unsalted"
    import hashlib

    return hashlib.sha256(
        ",".join(str(int(h)) for h in sorted(hot)).encode()
    ).hexdigest()[:16]


# The logically-atomic layout spec (bits / buckets / salting / region /
# padding) is split across two independent write calls; every mismatch
# between them is a SILENT wrong answer (missed pairs) or a silently
# reinstated shuffle.  So each write records its spec as table properties
# and the join refuses mismatched tables loudly.  dsi.region matters as
# much as dsi.bits: the SAME (x, y) lands in a different cell id under a
# different region (TAXI-BJ vs DIDI-CD), so two region-mismatched tables
# would equi-join on incomparable keys and silently return missing/wrong
# matches.  dsi.kind ('points' / 'query_cells') is NOT in the equality set
# — the two sides legitimately differ — but each side is validated below.
_SPEC_KEYS = ("dsi.bits", "dsi.n_buckets", "dsi.salted", "dsi.n_salt",
              "dsi.hot_fp", "dsi.region")


def _region_fingerprint(region: Region) -> str:
    # repr round-trips doubles exactly, so regions differing in any bound
    # — by any ULP — fingerprint differently.
    return (f"{region.x_lo!r},{region.y_lo!r},"
            f"{region.x_hi!r},{region.y_hi!r}")


def _set_spec(spark, table, *, bits, n_buckets, hot, n_salt, eps, region,
              kind) -> None:
    props = {
        "dsi.bits": str(bits),
        "dsi.n_buckets": str(n_buckets),
        "dsi.salted": "1" if hot is not None else "0",
        "dsi.n_salt": str(n_salt if hot is not None else 1),
        "dsi.hot_fp": _hot_fingerprint(hot),
        "dsi.region": _region_fingerprint(region),
        "dsi.kind": kind,
    }
    if eps is not None:
        props["dsi.eps"] = repr(float(eps))
    kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")


def _get_spec(spark, table: str) -> dict[str, str]:
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    spec = {r["key"]: r["value"] for r in rows if r["key"].startswith("dsi.")}
    if not all(k in spec for k in _SPEC_KEYS + ("dsi.kind",)):
        raise ValueError(
            f"table {table} carries no (complete) bucket-layout spec; write "
            "it with write_bucketed_points / write_bucketed_query_cells "
            f"(found: {sorted(spec)})"
        )
    return spec


def bucketed_point_range_join(
    spark: SparkSession,
    points_table: str,
    queries_table: str,
    eps: float = EPSILON,
) -> DataFrame:
    """Range join over two tables pre-bucketed on the routing cell: same
    semantics as point_range_join (epsilon-rect refine + result-set dedup),
    but the only Exchange in the plan is the one that shuffles the (small)
    RESULT for dropDuplicates — the doc and query scans feed the join
    co-located.  If both tables carry the salted bucket spec (written with
    ``hot``), the join key is (cell, salt) and hot-cell probe work is
    spread across n_salt co-located partitions.  tests/test_bucketing.py
    asserts both the plan shape (exactly one Exchange, bucketed scans) and
    result equality with the broadcast join.

    The two tables' recorded specs must agree (same bits / bucket count /
    salting / hot list) and the refine ``eps`` must not exceed the padding
    the query cells were exploded with — every such mismatch would be a
    silent wrong answer or a silently reinstated shuffle, so this raises
    instead."""
    ps = _get_spec(spark, points_table)
    qp = _get_spec(spark, queries_table)
    # kind check FIRST: a swapped/wrongly-written argument would otherwise
    # surface as a confusing eps/spec error (or a bare KeyError) instead of
    # naming the actual mistake.
    for tbl, spec, want in (
        (points_table, ps, "points"),
        (queries_table, qp, "query_cells"),
    ):
        if spec["dsi.kind"] != want:
            raise ValueError(
                f"{tbl} was written as dsi.kind={spec['dsi.kind']!r} but is "
                f"passed as the {want!r} side of bucketed_point_range_join; "
                "arguments are (points_table, queries_table) — write the "
                "table with the matching write_bucketed_* function or swap "
                "the arguments"
            )
    diff = [k for k in _SPEC_KEYS if ps[k] != qp[k]]
    if diff:
        raise ValueError(
            f"bucket-layout spec mismatch between {points_table} and "
            f"{queries_table}: "
            + ", ".join(f"{k}: {ps[k]} != {qp[k]}" for k in diff)
            + " — rewrite one side with matching write_bucketed_* params"
        )
    if float(eps) > float(qp["dsi.eps"]):
        raise ValueError(
            f"join eps={eps} exceeds the eps={qp['dsi.eps']} the query "
            f"cells of {queries_table} were padded with; matches near cell "
            "borders would be silently missed — rewrite the query table "
            "with the larger eps"
        )
    pts = spark.table(points_table)
    q = spark.table(queries_table)
    key = ["cell", "salt"] if ps["dsi.salted"] == "1" else ["cell"]
    joined = pts.join(q, key).filter(
        rect_contains_point(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            F.col("x"), F.col("y"), eps,
        )
    )
    return (
        joined.select("query_id", F.col("id").alias("doc_id"))
        .dropDuplicates(["query_id", "doc_id"])
    )


def physical_plan_str(df: DataFrame) -> str:
    """The physical plan as a string (pre-execution; with AQE this is the
    initial plan, which is where Exchange placement is decided — AQE can
    coalesce or replan an Exchange but never removes a bucketed scan's
    exemption)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the plan — the quantity
    bucketing exists to minimize.  BroadcastExchange is deliberately NOT
    counted (a broadcast build is not the per-row shuffle this module
    optimizes away; pin auto-broadcast off if asserting the shuffled
    regime), and ReusedExchange references are skipped so a reused shuffle
    is counted once."""
    return sum(
        1
        for line in physical_plan_str(df).splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
    )
