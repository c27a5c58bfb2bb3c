"""Point-in-polygon join: cell prefilter + exact ray-casting refine.

North-star upgrade of the reference's MBR-only matching (its exact
rect-segment intersection code is dead, Rectangle.java:311-327; production
matching stops at epsilon-MBR — SURVEY.md §2.6).  Classic filter-refine:

  filter  = covering cells of the polygon bbox, equi-joined on the Morton
            cell (same routing as the range join, GlobalTreePF.java:51-72);
  refine  = even-odd ray casting, vectorized in NumPy over Arrow batches
            (mapInPandas) — one pass per polygon over the batch's candidate
            points, no per-row Python.

Polygons are query-side metadata (small); they travel to executors as a
Spark broadcast variable keyed by query_id, so candidate rows stay narrow
(cell, doc_id, x, y, query_id).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import DEFAULT_REGION, JOIN_BITS, Region
from distributed_spatial_index_spark.functions.cells import (
    cell_id_col,
    covering_cells_col,
)


def ray_cast_np(px: np.ndarray, py: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Even-odd rule point-in-polygon, vectorized over points.

    ``verts``: (n, 2) closed-or-open ring (closing edge added implicitly).
    Boundary points are not guaranteed either way (measure-zero for the
    derived double workloads; exact oracles avoid edge-incident points).
    """
    inside = np.zeros(len(px), dtype=bool)
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        crosses = (y1 > py) != (y2 > py)
        if not crosses.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside ^= crosses & (px < xint)
    return inside


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
) -> DataFrame:
    """points(id, x, y) ⋈ polygons(query_id, vertices array<struct<x,y>>)
    → (query_id, doc_id) for points strictly inside each polygon."""
    spark = points.sparkSession

    poly_rows = polygons.select("query_id", "vertices").collect()
    polys = {
        r["query_id"]: np.array([(v["x"], v["y"]) for v in r["vertices"]])
        for r in poly_rows
    }
    bc = spark.sparkContext.broadcast(polys)

    # bbox per polygon -> covering cells (query side, tiny)
    vx = F.transform(F.col("vertices"), lambda v: v["x"])
    vy = F.transform(F.col("vertices"), lambda v: v["y"])
    qcells = (
        polygons.select(
            "query_id",
            F.array_min(vx).alias("xmin"), F.array_min(vy).alias("ymin"),
            F.array_max(vx).alias("xmax"), F.array_max(vy).alias("ymax"),
        )
        .withColumn(
            "cell",
            F.explode(covering_cells_col(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
                bits=bits, region=region,
            )),
        )
        .select("query_id", "cell", "xmin", "ymin", "xmax", "ymax")
    )

    pts = points.withColumn("cell", cell_id_col(F.col("x"), F.col("y"), bits, region))
    # JVM-side bbox prefilter cuts the Arrow transfer into the Python
    # refine to points that can possibly be inside the polygon
    cand = (
        pts.join(F.broadcast(qcells), "cell")
        .filter(
            (F.col("x") >= F.col("xmin")) & (F.col("x") <= F.col("xmax"))
            & (F.col("y") >= F.col("ymin")) & (F.col("y") <= F.col("ymax"))
        )
        .select("query_id", F.col("id").alias("doc_id"), "x", "y")
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized across the WHOLE batch, not per query: polygons are
        # padded to a [Q, maxV, 2] tensor once, rows gather their polygon by
        # query index, and the even-odd rule runs as maxV (<= a dozen)
        # NumPy passes over the full batch.
        polys_local = bc.value
        qids_sorted = sorted(polys_local)
        qindex = {q: i for i, q in enumerate(qids_sorted)}
        nv = np.array([len(polys_local[q]) for q in qids_sorted])
        maxv = int(nv.max()) if len(nv) else 0
        verts = np.zeros((len(qids_sorted), maxv, 2))
        for i, q in enumerate(qids_sorted):
            verts[i, : nv[i]] = polys_local[q]
        for pdf in batches:
            if pdf.empty:
                continue
            px = pdf["x"].to_numpy()
            py = pdf["y"].to_numpy()
            qi = np.array([qindex[q] for q in pdf["query_id"].to_numpy()])
            n_edges = nv[qi]
            inside = np.zeros(len(pdf), dtype=bool)
            for i in range(maxv):
                active = i < n_edges
                j = np.where(i + 1 < n_edges, i + 1, 0)  # wrap per-row
                x1 = verts[qi, i, 0]
                y1 = verts[qi, i, 1]
                x2 = verts[qi, j, 0]
                y2 = verts[qi, j, 1]
                crosses = active & ((y1 > py) != (y2 > py))
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
                inside ^= crosses & (px < xint)
            yield pdf.loc[inside, ["query_id", "doc_id"]]

    return (
        cand.mapInPandas(refine, schema="query_id long, doc_id long")
        .dropDuplicates(["query_id", "doc_id"])
    )


def convex_pip_join(
    points: DataFrame,
    polygons: DataFrame,
    bits: int = JOIN_BITS,
    region: Region = DEFAULT_REGION,
) -> DataFrame:
    """PIP join for CONVEX polygons with CCW vertices — entirely JVM-side:
    strict interior <=> every edge's cross product with the point is
    positive, expressed with higher-order array functions (F.forall over the
    vertex ring), so the refine stays inside whole-stage codegen with no
    Arrow transfer.  Use pip_join (ray casting) for concave rings.
    """
    vx = F.transform(F.col("vertices"), lambda v: v["x"])
    vy = F.transform(F.col("vertices"), lambda v: v["y"])
    qcells = (
        polygons.select(
            "query_id", "vertices",
            F.array_min(vx).alias("xmin"), F.array_min(vy).alias("ymin"),
            F.array_max(vx).alias("xmax"), F.array_max(vy).alias("ymax"),
        )
        .withColumn(
            "cell",
            F.explode(covering_cells_col(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
                bits=bits, region=region,
            )),
        )
        .select("query_id", "cell", "vertices", "xmin", "ymin", "xmax", "ymax")
    )
    pts = points.withColumn("cell", cell_id_col(F.col("x"), F.col("y"), bits, region))
    cand = pts.join(F.broadcast(qcells), "cell").filter(
        (F.col("x") >= F.col("xmin")) & (F.col("x") <= F.col("xmax"))
        & (F.col("y") >= F.col("ymin")) & (F.col("y") <= F.col("ymax"))
    )
    n = F.size("vertices")
    idx = F.sequence(F.lit(0), n - 1)

    def edge_positive(i):
        v1 = F.element_at("vertices", i + 1)               # 1-based
        v2 = F.element_at("vertices", F.pmod(i + 1, n) + 1)  # wrap
        cross = (v2["x"] - v1["x"]) * (F.col("y") - v1["y"]) - (
            v2["y"] - v1["y"]
        ) * (F.col("x") - v1["x"])
        return cross > 0

    inside = F.forall(idx, edge_positive)
    return (
        cand.filter(inside)
        .select("query_id", F.col("id").alias("doc_id"))
        .dropDuplicates(["query_id", "doc_id"])
    )


# --- deterministic triangle workload (oracle-expressible) -------------------

# triangle around a point (x, y): CCW vertices
TRI = [(0.0, -25.0), (30.0, 20.0), (-28.0, 15.0)]


def triangle_polygons(queries_xy: DataFrame) -> DataFrame:
    """(query_id, x, y) -> (query_id, vertices) CCW triangles."""
    verts = F.array(
        *[
            F.struct((F.col("x") + F.lit(dx)).alias("x"),
                     (F.col("y") + F.lit(dy)).alias("y"))
            for dx, dy in TRI
        ]
    )
    return queries_xy.select("query_id", verts.alias("vertices"))


def triangle_pip_oracle_sql(points_sql: str, queries_xy_sql: str) -> str:
    """Strict-interior half-plane test for the CCW triangle (valid because
    triangles are convex); matches ray casting except on edges (measure
    zero for derived-double workloads)."""

    def vert(i: int) -> tuple[str, str]:
        dx, dy = TRI[i]
        return (f"(q.x + {dx!r})", f"(q.y + {dy!r})")

    conds = []
    for i in range(3):
        ux, uy = vert(i)
        vx2, vy2 = vert((i + 1) % 3)
        conds.append(
            f"(({vx2} - {ux}) * (p.y - {uy}) - ({vy2} - {uy}) * (p.x - {ux})) > 0"
        )
    cond = " AND ".join(conds)
    return f"""
        SELECT DISTINCT q.query_id, p.id AS doc_id
        FROM ({points_sql}) p, ({queries_xy_sql}) q
        WHERE {cond}
    """
