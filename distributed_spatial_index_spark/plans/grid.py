"""Two-level grid + sorted-cell-range partition index (driver-side planner).

Successor of the reference's density-adaptive grid-quadtree (GTree): the
reference recomputes `elemNum` per node from a density snapshot, relaxes a
low bound until the leaf count fits the worker pool, and rebuilds unbalanced
subtrees by density-weighted recursive 4-way splits chosen from marginal
density prefix sums (GTree.java:164-202, GDataNode.java:43-121,
GTree.java:138-159).  We keep exactly that splitting policy — NumPy 2-D
prefix sums + recursive quad split with a per-leaf weight bound — but the
output is not a mutable distributed tree: it is

  1. a LEAF LIST (grid-aligned rectangles with weights), and
  2. a SORTED-CELL-RANGE INDEX: leaves sorted by the Morton code of their
     anchor cell, packed greedily into P contiguous partition ranges, so
     cell -> partition is a binary search over P boundaries (broadcastable,
     no tree descent).

Partition-id stability across rebuilds (the reference's Hungarian
assignment + leaf-ID pool, GTree.java:251-373, Hungary.java) is provided by
``stable_reassign`` — an exact Hungarian solver (standard shortest
augmenting path formulation) maximizing kept-in-place weight.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from distributed_spatial_index_spark.functions.cells import morton_np


@dataclass(frozen=True)
class Leaf:
    """Grid-aligned rectangle [x0, x1) x [y0, y1) in fine-cell coordinates."""

    x0: int
    y0: int
    x1: int
    y1: int
    weight: int


@dataclass
class GridIndex:
    """Sorted-cell-range index: partition of the Morton cell space.

    Rectangle leaves are not Morton-contiguous, so the lookup structure is
    the run-length encoding of the per-cell partition array in Morton order:
    ``run_starts[i]`` is the first morton code of run i, owned by
    ``run_pids[i]``.  cell -> partition is one binary search — the broadcast
    replacement for the reference's replicated GTree descent
    (GTree.java:395-407).
    """

    bits: int
    leaves: list[Leaf]
    run_starts: np.ndarray   # sorted morton codes, one per run
    run_pids: np.ndarray     # partition id per run
    num_partitions: int

    def partition_of_cells(self, cells: np.ndarray) -> np.ndarray:
        """cell morton code -> partition id, via binary search (vectorized)."""
        idx = np.searchsorted(self.run_starts, cells, side="right") - 1
        idx = np.clip(idx, 0, len(self.run_starts) - 1)
        return self.run_pids[idx]


def _prefix2d(density: np.ndarray) -> np.ndarray:
    p = np.zeros((density.shape[0] + 1, density.shape[1] + 1), dtype=np.int64)
    p[1:, 1:] = density.cumsum(0).cumsum(1)
    return p


def _rect_sum(p: np.ndarray, x0: int, y0: int, x1: int, y1: int) -> int:
    return int(p[x1, y1] - p[x0, y1] - p[x1, y0] + p[x0, y0])


def _split_leaf(p: np.ndarray, leaf: Leaf) -> list[Leaf] | None:
    """Split a leaf at the density-balanced midpoint of its longer axis
    (the reference picks split coordinates from marginal density prefix sums,
    GTree.java:138-159; a 4-way split is two successive 2-way splits)."""
    x0, y0, x1, y1 = leaf.x0, leaf.y0, leaf.x1, leaf.y1
    best = None
    # try both axes, keep the more balanced cut
    if x1 - x0 > 1:
        sums = np.array([_rect_sum(p, x0, y0, xm, y1) for xm in range(x0 + 1, x1)])
        i = int(np.argmin(np.abs(sums - leaf.weight / 2)))
        xm = x0 + 1 + i
        halves = (
            Leaf(x0, y0, xm, y1, int(sums[i])),
            Leaf(xm, y0, x1, y1, leaf.weight - int(sums[i])),
        )
        best = (abs(halves[0].weight - halves[1].weight), halves)
    if y1 - y0 > 1:
        sums = np.array([_rect_sum(p, x0, y0, x1, ym) for ym in range(y0 + 1, y1)])
        i = int(np.argmin(np.abs(sums - leaf.weight / 2)))
        ym = y0 + 1 + i
        halves = (
            Leaf(x0, y0, x1, ym, int(sums[i])),
            Leaf(x0, ym, x1, y1, leaf.weight - int(sums[i])),
        )
        cand = (abs(halves[0].weight - halves[1].weight), halves)
        if best is None or cand[0] < best[0]:
            best = cand
    return list(best[1]) if best else None


def build_grid_index(
    density: np.ndarray,
    num_partitions: int,
    bits: int,
    max_leaves: int | None = None,
) -> GridIndex:
    """Recursive density-balanced splitting until every leaf weighs at most
    ~total/num_partitions (the reference's relaxed low bound,
    GTree.java:169-191), then greedy packing of morton-sorted leaves into
    contiguous partition ranges."""
    n = density.shape[0]
    assert density.shape == (n, n) and n == (1 << bits)
    total = int(density.sum())
    max_leaves = max_leaves or max(4 * num_partitions, 64)
    bound = max(1, total // max(num_partitions, 1))

    p = _prefix2d(density)
    import heapq

    # max-heap on weight; split heaviest leaf first
    heap: list[tuple[int, int, Leaf]] = []
    seq = 0

    def push(leaf: Leaf) -> None:
        nonlocal seq
        heapq.heappush(heap, (-leaf.weight, seq, leaf))
        seq += 1

    push(Leaf(0, 0, n, n, total))
    done: list[Leaf] = []
    while heap and len(heap) + len(done) < max_leaves:
        w, _, leaf = heapq.heappop(heap)
        if -w <= bound:
            heapq.heappush(heap, (w, seq, leaf))
            break
        halves = _split_leaf(p, leaf)
        if halves is None:  # single hot cell, cannot split further -> salt it
            done.append(leaf)
            continue
        for h in halves:
            push(h)
    leaves = done + [leaf for _, _, leaf in heap]

    # sorted-cell-range packing: order leaves by morton anchor, walk greedily
    anchors = morton_np(
        np.array([lf.x0 for lf in leaves]), np.array([lf.y0 for lf in leaves]), bits
    )
    order = np.argsort(anchors, kind="stable")
    leaves = [leaves[i] for i in order]
    target = total / num_partitions if num_partitions else 1
    pid, acc = 0, 0
    leaf_pid = np.empty(len(leaves), dtype=np.int64)
    for i, lf in enumerate(leaves):
        remaining_leaves = len(leaves) - i
        remaining_pids = num_partitions - pid
        if acc > 0 and (
            acc + lf.weight / 2 > target * (pid + 1)
            or remaining_leaves <= remaining_pids - 1
        ) and pid < num_partitions - 1:
            pid += 1
        leaf_pid[i] = pid
        acc += lf.weight
    return GridIndex(
        bits=bits,
        leaves=leaves,
        num_partitions=num_partitions,
        **_rle_from_leaves(leaves, leaf_pid, bits),
    )


def _rle_from_leaves(
    leaves: list[Leaf], leaf_pid: np.ndarray, bits: int
) -> dict[str, np.ndarray]:
    """Expand leaves to the per-cell partition array (indexed by morton code,
    a permutation of 0..n^2-1), then run-length encode it."""
    n = 1 << bits
    pid_by_code = np.full(n * n, -1, dtype=np.int64)
    for lf, pid in zip(leaves, leaf_pid):
        xs, ys = np.meshgrid(
            np.arange(lf.x0, lf.x1), np.arange(lf.y0, lf.y1), indexing="ij"
        )
        pid_by_code[morton_np(xs.ravel(), ys.ravel(), bits)] = pid
    assert (pid_by_code >= 0).all(), "leaves must tile the grid exactly"
    change = np.flatnonzero(np.diff(pid_by_code)) + 1
    run_starts = np.concatenate(([0], change))
    return {"run_starts": run_starts, "run_pids": pid_by_code[run_starts]}


# --- STR sample-based partitioner (reference I12, the Xie frame) ------------


def build_str_index(
    sample_xy: np.ndarray, num_partitions: int, bits: int,
    region_width: float, region_height: float,
    x_lo: float = 0.0, y_lo: float = 0.0,
) -> GridIndex:
    """Sort-Tile-Recursive packing of a coordinate sample into P rectangles
    (STRTree.java:17-62: sort by y, slice into sqrt(P) rows, sort each row by
    x, slice into columns), then snapped to the fine grid and published as
    the same sorted-cell-range index as the adaptive builder.

    A static alternative to build_grid_index: one driver-side sample instead
    of a density aggregate; no rebalancing.
    """
    import math

    n = 1 << bits
    p_rows = max(int(math.floor(math.sqrt(num_partitions))), 1)
    p_cols = int(math.ceil(num_partitions / p_rows))

    ys = np.sort(sample_xy[:, 1])
    # row boundaries in grid-cell coordinates (snap so leaves tile exactly)
    row_edges = [0]
    for i in range(1, p_rows):
        cut = ys[int(len(ys) * i / p_rows)]
        cell = int(np.clip(np.floor((cut - y_lo) / region_height * n), 1, n - 1))
        row_edges.append(max(cell, row_edges[-1] + 1) if row_edges[-1] + 1 < n else n - 1)
    row_edges.append(n)

    leaves: list[Leaf] = []
    leaf_pid: list[int] = []
    pid = 0
    for ri in range(p_rows):
        y0, y1 = row_edges[ri], row_edges[ri + 1]
        in_row = sample_xy[
            (sample_xy[:, 1] >= y_lo + y0 / n * region_height)
            & (sample_xy[:, 1] < y_lo + y1 / n * region_height)
        ]
        xs = np.sort(in_row[:, 0]) if len(in_row) else np.array([x_lo])
        cols = p_cols if ri < p_rows - 1 else num_partitions - pid
        col_edges = [0]
        for i in range(1, cols):
            cut = xs[int(len(xs) * i / cols)] if len(xs) else x_lo
            cell = int(np.clip(np.floor((cut - x_lo) / region_width * n), 1, n - 1))
            col_edges.append(max(cell, col_edges[-1] + 1) if col_edges[-1] + 1 < n else n - 1)
        col_edges.append(n)
        for ci in range(len(col_edges) - 1):
            leaves.append(Leaf(col_edges[ci], y0, col_edges[ci + 1], y1, 0))
            leaf_pid.append(pid)
            pid += 1
    return GridIndex(
        bits=bits,
        leaves=leaves,
        num_partitions=num_partitions,
        **_rle_from_leaves(leaves, np.array(leaf_pid), bits),
    )


# --- min-migration partition-id stability (reference I4) --------------------


def hungarian_max(weight: np.ndarray) -> np.ndarray:
    """Exact assignment maximizing total weight (square matrix), via the
    standard Jonker-Volgenant shortest-augmenting-path formulation of the
    Hungarian method.  Replaces the reference's Hungary.java (seeded-random
    O(n^4) variant); same optimum, deterministic.

    Returns col index assigned to each row.
    """
    n = weight.shape[0]
    assert weight.shape == (n, n)
    cost = (weight.max() - weight).astype(np.float64)  # maximize -> minimize
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.full(n + 1, n, dtype=np.int64)   # p[j] = row matched to col j
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(n):
        p[n] = i
        j0 = n
        minv = np.full(n + 1, np.inf)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = np.inf
            j1 = -1
            for j in range(n):
                if not used[j]:
                    cur = cost[i0, j] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == n:
                break
        while j0 != n:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    row_to_col = np.empty(n, dtype=np.int64)
    for j in range(n):
        if p[j] < n:
            row_to_col[p[j]] = j
    return row_to_col


def stable_reassign(
    old: GridIndex, new: GridIndex, density: np.ndarray
) -> GridIndex:
    """Relabel ``new``'s partition ids to maximize density kept on its old
    partition (the reference's overlap-matrix + Hungarian step,
    GTree.java:251-324): entry (a, b) = density weight of the spatial overlap
    between old partition a and new partition b."""
    n = max(old.num_partitions, new.num_partitions)
    grid = density.shape[0]
    cx, cy = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    codes = morton_np(cx.ravel(), cy.ravel(), new.bits)
    w = density.ravel()
    old_pid = old.partition_of_cells(codes)
    new_pid = new.partition_of_cells(codes)
    overlap = np.zeros((n, n), dtype=np.int64)
    np.add.at(overlap, (old_pid, new_pid), w)
    assign = hungarian_max(overlap.T.astype(np.float64))  # new -> old label
    relabel = np.array([int(assign[b]) for b in range(n)])
    return GridIndex(
        bits=new.bits,
        leaves=new.leaves,
        run_starts=new.run_starts,
        run_pids=relabel[new.run_pids],
        num_partitions=new.num_partitions,
    )
