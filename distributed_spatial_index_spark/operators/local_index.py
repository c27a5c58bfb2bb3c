"""Per-partition local-index range join — the applyInPandas analog of the
reference's per-worker RC-tree probe (LocalTreePF.java:79-84,
RCtree.rectQuery RCtree.java:201-205).

The default engine path (operators/range_join.py) lets the cell equi-join do
all the work; this variant reproduces the reference's architecture shape
explicitly for workloads where a per-partition index pays off (very many
queries per partition):

  1. docs are co-located by the two-level grid map (plans/grid.py) — the
     GTree routing step;
  2. queries are routed to every overlapping grid partition — the
     boundary-duplication of GlobalTreePF.java:58-63;
  3. inside each partition, a NumPy "local index" (x-sorted arrays +
     searchsorted range cuts, the vectorized successor of the RC-tree's
     filter-refine, RCDataNode.java:77-89) answers all of that partition's
     queries in one Arrow batch;
  4. dropDuplicates merges boundary duplicates (QueryResultPF.java:44-48).

Per-partition sorted-array probing costs O(log n + answer) per query versus
the equi-join's O(docs_in_cell); it wins when queries >> cells.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import DEFAULT_REGION, EPSILON, Region
from distributed_spatial_index_spark.functions.cells import cell_id_np, morton_np
from distributed_spatial_index_spark.plans.grid import GridIndex
from distributed_spatial_index_spark.plans.partitioning import with_partition_col


def local_index_range_join(
    points: DataFrame,
    queries: DataFrame,
    grid: GridIndex,
    eps: float = EPSILON,
    region: Region = DEFAULT_REGION,
) -> DataFrame:
    """points(id, x, y) ⋈ queries(query_id, xmin..ymax) via grid co-location
    + per-partition vectorized index probe.  Result = (query_id, doc_id)
    set, identical to point_range_join."""
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast((grid.run_starts, grid.run_pids, grid.bits))

    pts = with_partition_col(points, grid, region=region)

    # route each query to every grid partition its (padded) rect overlaps:
    # compute covering fine cells in NumPy, map to pids, explode distinct
    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        starts, pids, bits = bc.value
        n = 1 << bits
        for pdf in batches:
            if pdf.empty:
                continue
            out_rows = []
            cw = region.width / n
            ch = region.height / n
            for row in pdf.itertuples(index=False):
                x0 = int(np.clip((row.xmin - eps - region.x_lo) / cw, 0, n - 1))
                x1 = int(np.clip((row.xmax + eps - region.x_lo) / cw, 0, n - 1))
                y0 = int(np.clip((row.ymin - eps - region.y_lo) / ch, 0, n - 1))
                y1 = int(np.clip((row.ymax + eps - region.y_lo) / ch, 0, n - 1))
                cx, cy = np.meshgrid(
                    np.arange(x0, x1 + 1), np.arange(y0, y1 + 1), indexing="ij"
                )
                codes = morton_np(cx.ravel(), cy.ravel(), bits)
                idx = np.clip(
                    np.searchsorted(starts, codes, side="right") - 1,
                    0, len(starts) - 1,
                )
                for p in np.unique(pids[idx]):
                    out_rows.append(
                        (int(p), row.query_id, row.xmin, row.ymin,
                         row.xmax, row.ymax)
                    )
            yield pd.DataFrame(
                out_rows,
                columns=["pid", "query_id", "xmin", "ymin", "xmax", "ymax"],
            )

    routed_q = queries.select("query_id", "xmin", "ymin", "xmax", "ymax").mapInPandas(
        route,
        schema="pid long, query_id long, xmin double, ymin double, "
               "xmax double, ymax double",
    )

    # cogroup by pid: build the local index once per partition, probe all
    # of that partition's queries vectorized
    def probe(pdfs: pd.DataFrame, qdfs: pd.DataFrame) -> pd.DataFrame:
        if pdfs.empty or qdfs.empty:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64")})
        order = np.argsort(pdfs["x"].to_numpy(), kind="stable")
        xs = pdfs["x"].to_numpy()[order]
        ys = pdfs["y"].to_numpy()[order]
        ids = pdfs["id"].to_numpy()[order]
        out_q = []
        out_d = []
        for row in qdfs.itertuples(index=False):
            lo = np.searchsorted(xs, row.xmin - eps, side="left")
            hi = np.searchsorted(xs, row.xmax + eps, side="right")
            m = (ys[lo:hi] >= row.ymin - eps) & (ys[lo:hi] <= row.ymax + eps)
            hits = ids[lo:hi][m]
            out_q.append(np.full(len(hits), row.query_id, dtype=np.int64))
            out_d.append(hits)
        return pd.DataFrame({
            "query_id": np.concatenate(out_q) if out_q else [],
            "doc_id": np.concatenate(out_d) if out_d else [],
        })

    joined = (
        pts.select("pid", "id", "x", "y")
        .groupBy("pid")
        .cogroup(routed_q.groupBy("pid"))
        .applyInPandas(
            lambda pdf, qdf: probe(pdf, qdf),
            schema="query_id long, doc_id long",
        )
    )
    return joined.dropDuplicates(["query_id", "doc_id"])
