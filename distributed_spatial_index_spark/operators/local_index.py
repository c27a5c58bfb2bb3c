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

from distributed_spatial_index_spark.config import DEFAULT_REGION, EPSILON, Region
from distributed_spatial_index_spark.functions.cells import morton_np
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
    # covering fine cells via the padded-ragged-expansion trick (qi = repeat
    # by per-query cell count), cells -> pids by one searchsorted over the
    # whole batch, distinct (query, pid) by integer-encoded np.unique —
    # no per-row Python.
    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        starts, pids, bits = bc.value
        n = 1 << bits
        cw = region.width / n
        ch = region.height / n
        n_pids = int(pids.max()) + 1 if len(pids) else 1
        for pdf in batches:
            if pdf.empty:
                continue
            xmin = pdf["xmin"].to_numpy()
            ymin = pdf["ymin"].to_numpy()
            xmax = pdf["xmax"].to_numpy()
            ymax = pdf["ymax"].to_numpy()
            # clip-then-truncate == the scalar int(np.clip(...)) semantics
            x0 = np.clip((xmin - eps - region.x_lo) / cw, 0, n - 1).astype(np.int64)
            x1 = np.clip((xmax + eps - region.x_lo) / cw, 0, n - 1).astype(np.int64)
            y0 = np.clip((ymin - eps - region.y_lo) / ch, 0, n - 1).astype(np.int64)
            y1 = np.clip((ymax + eps - region.y_lo) / ch, 0, n - 1).astype(np.int64)
            counts = (x1 - x0 + 1) * (y1 - y0 + 1)
            qi = np.repeat(np.arange(len(pdf)), counts)
            row_start = np.concatenate(([0], np.cumsum(counts)[:-1]))
            off = np.arange(int(counts.sum())) - row_start[qi]
            ny = (y1 - y0 + 1)[qi]
            cx = x0[qi] + off // ny
            cy = y0[qi] + off % ny
            codes = morton_np(cx, cy, bits)
            idx = np.clip(
                np.searchsorted(starts, codes, side="right") - 1,
                0, len(starts) - 1,
            )
            enc = np.unique(qi * n_pids + pids[idx])
            uqi = enc // n_pids
            upid = enc % n_pids
            yield pd.DataFrame({
                "pid": upid.astype(np.int64),
                "query_id": pdf["query_id"].to_numpy()[uqi],
                "xmin": xmin[uqi], "ymin": ymin[uqi],
                "xmax": xmax[uqi], "ymax": ymax[uqi],
            })

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
        # all queries' x-range cuts in two batched searchsorted calls, then
        # one ragged gather (flat = per-query arange stitched by repeat) for
        # the y refine — the whole partition answers in array ops
        qid = qdfs["query_id"].to_numpy()
        lo = np.searchsorted(xs, qdfs["xmin"].to_numpy() - eps, side="left")
        hi = np.searchsorted(xs, qdfs["xmax"].to_numpy() + eps, side="right")
        lens = hi - lo
        qi = np.repeat(np.arange(len(qdfs)), lens)
        flat = (
            np.arange(int(lens.sum()))
            - np.repeat(np.cumsum(lens) - lens, lens)
            + np.repeat(lo, lens)
        )
        m = (ys[flat] >= qdfs["ymin"].to_numpy()[qi] - eps) & (
            ys[flat] <= qdfs["ymax"].to_numpy()[qi] + eps
        )
        return pd.DataFrame({
            "query_id": qid[qi][m],
            "doc_id": ids[flat][m],
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
