"""Join-regime dispatch: pick the physical plan for the point-in-rect
join from evidence available BEFORE running it.

The engine ships three physical regimes with identical semantics (tests
assert value-equality pairwise):

* ``broadcast`` — operators/range_join.point_range_join: the query side's
  cell cover is broadcast, the doc side never shuffles.  Right whenever
  the query batch is driver-scale; wrong when it isn't (the broadcast
  build is serial driver time and executor memory).
* ``salted`` — plans/partitioning.salted_point_range_join: both sides
  shuffle on (cell, salt); hot cells split across n_salt tasks.  The
  100-TB fallback when the query side is too big to broadcast and the
  tables are not landed.
* ``bucketed`` — plans/bucketing.bucketed_point_range_join: zero-Exchange
  co-located SMJ over two landed tables.  Always right when available —
  the shuffle was paid once at ingest.

Catalyst/AQE cannot make this choice: AQE picks broadcast-vs-SMJ for one
logical join it already has, but these regimes are three DIFFERENT
logical plans (cell-cover explode + equi-join / salted duplicate +
equi-join / pre-bucketed scan).  The dispatch evidence, in cost order:

1. both sides landed with matching bucket specs — METADATA ONLY
   (catalog TBLPROPERTIES), no data touched;
2. query-side row count — one count() on the (by assumption smaller)
   query side, the same price AQE pays for its runtime stats;
3. doc-side skew for the salted regime's hot set — the COMMITTED density
   summary when the doc side is a landed table (metadata read; a stale
   summary only mis-sizes the salt set, never the results, so no
   freshness listing is paid here), else one <=4^bits-row aggregation.

The returned DataFrame carries ``.join_plan`` recording the regime and
the evidence the decision used, the same disclosure pattern as
knn's ``.knn_stats`` and the pruned join's ``.prune_stats``.
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


def point_range_join_auto(
    spark: SparkSession,
    points: DataFrame | str,
    queries: DataFrame | str,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
    eps: float = EPSILON,
    broadcast_rows: int = 500_000,
    skew_factor: int = 8,
    n_salt: int = 8,
) -> DataFrame:
    """points ⋈ queries (rect-contains, set semantics) under the regime
    the evidence picks; results identical across regimes.

    ``points``/``queries`` accept a DataFrame or a landed catalog table
    name.  Both names with matching bucket specs -> ``bucketed``.  A
    points NAME with DataFrame queries resolves through the catalog (its
    committed density, if any, feeds the salted regime's hot set).  A
    queries name WITHOUT a landed points table is refused: landed query
    tables store pre-exploded cells, which only the bucketed regime
    consumes.

    ``broadcast_rows`` is the broadcast ceiling in QUERY ROWS (each
    exploded cover row is ~48 B plus the rect; 500k rows ~ a few tens of
    MB built on the driver — size it to
    spark.sql.autoBroadcastJoinThreshold's spirit, conservatively).
    ``skew_factor``: a cell is hot when its doc count exceeds
    skew_factor x the mean non-empty cell's — above it, the salted
    regime splits the cell across ``n_salt`` tasks.
    """
    from distributed_spatial_index_spark.operators.density import density_grid
    from distributed_spatial_index_spark.operators.range_join import (
        point_range_join,
    )
    from distributed_spatial_index_spark.plans.bucketing import (
        _get_spec,
        _region_fingerprint,
        bucketed_point_range_join,
    )
    from distributed_spatial_index_spark.plans.partitioning import (
        hot_cells_from_density,
        salted_point_range_join,
    )

    if isinstance(points, str) and isinstance(queries, str):
        out = bucketed_point_range_join(spark, points, queries, eps=eps)
        out.join_plan = {
            "regime": "bucketed",
            "evidence": "both sides landed, bucket specs match "
                        "(catalog metadata only)",
        }
        return out
    if isinstance(queries, str):
        raise ValueError(
            "queries is a landed table name but points is not: landed "
            "query tables hold pre-exploded cells, which only the "
            "bucketed regime (both sides landed) consumes — pass the "
            "query rects as a DataFrame, or land the points table too"
        )

    committed_density = None
    if isinstance(points, str):
        spec = _get_spec(spark, points)
        if spec.get("dsi.kind") != "points":
            raise ValueError(
                f"{points} records dsi.kind={spec.get('dsi.kind')!r}; "
                "the doc side must be a points table"
            )
        tbits = int(spec["dsi.bits"])
        # The committed density's cell ids live in the TABLE's region; a
        # caller joining under a different region derives incomparable
        # cell ids, so the summary would size the hot set in the wrong
        # space (results stay exact — salting is semantics-free — but the
        # skew guard would silently do nothing).  Fall back to the live
        # aggregation unless the regions fingerprint-match.
        if (
            bits <= tbits
            and "dsi.path" in spec
            and spec.get("dsi.region") == _region_fingerprint(region)
        ):
            from distributed_spatial_index_spark.sources.metastore import (
                meta_read,
            )

            try:
                dens = meta_read(spark, spec["dsi.path"], "density")
                shift = 2 * (tbits - bits)
                committed_density = dens.groupBy(
                    (F.shiftright(F.col("cell"), shift) if shift
                     else F.col("cell")).alias("cell")
                ).agg(F.sum("n").alias("n"))
            except ValueError:
                pass  # never manifested: fall back to aggregating
        points = spark.table(points).select("id", "x", "y")

    n_queries = queries.count()
    if n_queries <= broadcast_rows:
        out = point_range_join(
            points, queries, bits=bits, region=region, eps=eps
        )
        out.join_plan = {
            "regime": "broadcast",
            "evidence": f"query side {n_queries} rows "
                        f"<= broadcast_rows={broadcast_rows}",
            "n_queries": n_queries,
        }
        return out

    dens = (
        committed_density
        if committed_density is not None
        else density_grid(points, bits=bits)
    )
    stats = dens.agg(
        F.avg("n").alias("mean"), F.max("n").alias("mx")
    ).collect()[0]
    threshold = int(stats["mean"] * skew_factor)
    hot = (
        hot_cells_from_density(dens, threshold)
        if stats["mx"] > threshold
        else []
    )
    out = salted_point_range_join(
        points, queries, hot, n_salt=n_salt, bits=bits,
        region=region, eps=eps,
    )
    out.join_plan = {
        "regime": "salted",
        "evidence": (
            f"query side {n_queries} rows > broadcast_rows="
            f"{broadcast_rows}; hot = cells > {skew_factor}x mean "
            f"({threshold} docs) from "
            + ("the committed density summary (metadata read)"
               if committed_density is not None
               else "one density aggregation")
        ),
        "n_queries": n_queries,
        "n_hot_cells": len(hot),
    }
    return out
