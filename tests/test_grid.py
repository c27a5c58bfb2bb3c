"""Index-structure invariants for the two-level grid (FIXTURES.md §6,
mirroring the reference's GTree.check/GNode.check debug invariants)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_spatial_index_spark.functions.cells import morton_np
from distributed_spatial_index_spark.operators.density import density_grid, density_matrix
from distributed_spatial_index_spark.plans.grid import (
    build_grid_index,
    hungarian_max,
    stable_reassign,
)
from distributed_spatial_index_spark.plans import partitioning as pt
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR

BITS = 6  # 64x64 for fast tests


@pytest.fixture(scope="module")
def density():
    rng = np.random.default_rng(42)
    n = 1 << BITS
    d = rng.poisson(3, (n, n)).astype(np.int64)
    d[10:14, 10:14] += 500   # hot cluster
    d[40:42, 50:52] += 900   # hotter cluster
    return d


def test_leaves_tile_exactly(density):
    g = build_grid_index(density, num_partitions=16, bits=BITS)
    n = 1 << BITS
    cover = np.zeros((n, n), dtype=np.int64)
    for lf in g.leaves:
        cover[lf.x0:lf.x1, lf.y0:lf.y1] += 1
    assert (cover == 1).all()  # no overlap, no gap (GDirNode.checkGDirNode)


def test_leaf_weights_match_density(density):
    g = build_grid_index(density, num_partitions=16, bits=BITS)
    for lf in g.leaves:
        assert lf.weight == density[lf.x0:lf.x1, lf.y0:lf.y1].sum()


def test_partition_lookup_consistent_with_leaves(density):
    g = build_grid_index(density, num_partitions=16, bits=BITS)
    n = 1 << BITS
    cx, cy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    codes = morton_np(cx.ravel(), cy.ravel(), BITS)
    pids = g.partition_of_cells(codes)
    # rebuild expected pid per cell from leaves' run construction
    for lf, code_pid in zip(g.leaves, range(0)):
        pass
    # every cell of a leaf maps to one single partition
    by_cell = pids.reshape(-1)
    lut = {int(c): int(p) for c, p in zip(codes, by_cell)}
    for lf in g.leaves:
        cells = morton_np(*np.meshgrid(np.arange(lf.x0, lf.x1),
                                       np.arange(lf.y0, lf.y1),
                                       indexing="ij"), BITS).ravel()
        ps = {lut[int(c)] for c in cells}
        assert len(ps) == 1


def test_partition_load_bounds(density):
    P = 16
    g = build_grid_index(density, num_partitions=P, bits=BITS)
    n = 1 << BITS
    cx, cy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    codes = morton_np(cx.ravel(), cy.ravel(), BITS)
    pids = g.partition_of_cells(codes)
    loads = np.bincount(pids, weights=density.ravel(), minlength=P)
    total = density.sum()
    assert pids.max() < P  # pool size respected (GTree.java:191)
    assert loads.max() <= 2.0 * total / P  # balance (GTree.java:169)
    assert loads.min() >= 0.2 * total / P


def test_hungarian_vs_bruteforce():
    rng = np.random.default_rng(0)
    for n in [2, 3, 4, 5]:
        for _ in range(5):
            w = rng.integers(0, 100, (n, n)).astype(np.float64)
            got = w[np.arange(n), hungarian_max(w)].sum()
            best = max(
                sum(w[i, p[i]] for i in range(n))
                for p in itertools.permutations(range(n))
            )
            assert got == best


def test_stable_reassign_keeps_data_in_place(density):
    g1 = build_grid_index(density, num_partitions=8, bits=BITS)
    d2 = density.copy()
    d2[20:24, 20:24] += 300  # perturb density
    g2 = build_grid_index(d2, num_partitions=8, bits=BITS)
    g2s = stable_reassign(g1, g2, d2)
    n = 1 << BITS
    cx, cy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    codes = morton_np(cx.ravel(), cy.ravel(), BITS)
    w = d2.ravel()
    stay_raw = (g1.partition_of_cells(codes) == g2.partition_of_cells(codes))
    stay_stab = (g1.partition_of_cells(codes) == g2s.partition_of_cells(codes))
    assert (w * stay_stab).sum() >= (w * stay_raw).sum()
    assert (w * stay_stab).sum() >= 0.5 * w.sum()


def test_grid_repartition_balances_spark_side(spark):
    pts = src.geo_points(spark, SF_DIR, "lineitem")
    mat = density_matrix(density_grid(pts, bits=BITS), bits=BITS)
    g = build_grid_index(mat, num_partitions=8, bits=BITS)
    parts = (
        pt.with_partition_col(pts, g)
        .groupBy("pid").count().collect()
    )
    loads = {r["pid"]: r["count"] for r in parts}
    total = sum(loads.values())
    assert len(loads) <= 8
    assert max(loads.values()) <= 0.5 * total  # no partition owns half the data


def test_salted_join_equals_unsalted(spark):
    from distributed_spatial_index_spark.operators.range_join import point_range_join

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    dens = density_grid(pts, bits=10)  # match the join-routing resolution
    # salt everything dense enough to matter
    hot = pt.hot_cells_from_density(dens, threshold=3)  # sf0.001 is sparse
    got = pt.salted_point_range_join(pts, qs, hot=hot, n_salt=4)
    base = point_range_join(pts, qs)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, base.collect()))
    assert len(hot) > 0