"""Adaptive grid maintenance over a stream — the DIP frame end-to-end.

The reference's control loop: every logicWindow windows the density snapshot
is broadcast to the global GTree replicas, unbalanced subtrees are rebuilt
by density-weighted splits, leaf ids are reassigned by the Hungarian method
to minimize migration, and migration orders move indexed data between
workers through Redis (DensityPF.java:23-36, GTree.java:164-373,
LocalTreePF.java:108-151).

Spark-first: the stream's micro-batches accumulate a density grid
(foreachBatch); each rebuild interval the driver rebuilds the two-level grid
index (plans/grid.py), relabels it against the previous map with the exact
Hungarian assignment, and appends a row to a partition-map HISTORY with
migration stats.  There is no data migration step at all — the next batch's
``grid_repartition`` simply uses the new map; the shuffle IS the migration.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from distributed_spatial_index_spark.config import FINE_BITS
from distributed_spatial_index_spark.functions.cells import morton_np
from distributed_spatial_index_spark.operators.density import density_grid
from distributed_spatial_index_spark.plans.grid import (
    GridIndex,
    build_grid_index,
    stable_reassign,
)


@dataclass
class AdaptiveGridMaintainer:
    """Driver-side controller: feed it per-batch point DataFrames; it keeps
    the cumulative density and a history of id-stable partition maps."""

    num_partitions: int
    bits: int = FINE_BITS
    rebuild_every: int = 1  # rebuild interval in batches (logicWindow analog)
    density: np.ndarray = field(init=False)
    history: list[dict] = field(init=False, default_factory=list)
    current: GridIndex | None = field(init=False, default=None)
    _batches_seen: int = field(init=False, default=0)

    def __post_init__(self) -> None:
        n = 1 << self.bits
        self.density = np.zeros((n, n), dtype=np.int64)

    # -- the foreachBatch hook -------------------------------------------
    def on_batch(self, batch_df, epoch_id: int) -> None:
        """Accumulate the batch's density; rebuild the map on the interval.
        Usable directly as ``writeStream.foreachBatch(m.on_batch)``."""
        rows = density_grid(batch_df, bits=self.bits).collect()
        codes = np.array([r["cell"] for r in rows], dtype=np.int64)
        counts = np.array([r["n"] for r in rows], dtype=np.int64)
        if len(codes):
            n = 1 << self.bits
            flat = np.zeros(n * n, dtype=np.int64)
            flat[codes] += counts
            self.density += self._unflatten(flat)
        self._batches_seen += 1
        if self._batches_seen % self.rebuild_every == 0:
            self._rebuild(epoch_id)

    def _unflatten(self, flat: np.ndarray) -> np.ndarray:
        n = 1 << self.bits
        cx, cy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        codes = morton_np(cx.ravel(), cy.ravel(), self.bits)
        mat = np.zeros((n, n), dtype=np.int64)
        mat[cx.ravel(), cy.ravel()] = flat[codes]
        return mat

    def _rebuild(self, epoch_id: int) -> None:
        new = build_grid_index(self.density, self.num_partitions, self.bits)
        if self.current is not None:
            new = stable_reassign(self.current, new, self.density)
            moved = self._migration_fraction(self.current, new)
        else:
            moved = 1.0
        self.current = new
        self.history.append(
            {
                "epoch": int(epoch_id),
                "total_density": int(self.density.sum()),
                "n_leaves": len(new.leaves),
                "migration_fraction": float(moved),
            }
        )

    def _migration_fraction(self, old: GridIndex, new: GridIndex) -> float:
        """Density-weighted fraction of data whose partition id changed —
        what the reference's Hungarian step minimizes (GTree.java:251-324)."""
        n = 1 << self.bits
        cx, cy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        codes = morton_np(cx.ravel(), cy.ravel(), self.bits)
        w = self.density.ravel().astype(np.float64)
        if w.sum() == 0:
            return 0.0
        moved = old.partition_of_cells(codes) != new.partition_of_cells(codes)
        # density is indexed [cx, cy]; codes/moved follow the same raveling
        return float((w * moved).sum() / w.sum())
