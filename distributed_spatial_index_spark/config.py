"""Engine constants, mirroring the reference's workload configuration.

Reference sources (read-only at /root/reference):
- epsilon 1e-5:            Constants.java:17
- DIDI-CD region:          Constants.java:111-137 (8626 x 8872 units, epoch 2016-11-01)
- query radius 20.0:       conf.properties:9, ToInputItemFlatMap.java:34
- query ratio 1:150:       conf.properties:10, ToInputItemFlatMap.java:32
- window 60000 ms:         conf.properties:12, StreamingJob.java:134
- logical horizon 8 wins:  conf.properties:11, LocalTreePF.java:69
- density grid 128x128:    conf.properties:13 (gridDensity=127), DensityPF.java:42
- maxSegment 400:          Constants.java:24, ToInputItemFlatMap.java:29
"""

from __future__ import annotations

from dataclasses import dataclass

# Floating-point tolerance used by every geometric predicate (Constants.java:17).
EPSILON = 1e-5

# DIDI-CD-style region (Constants.java:121-128).
X_LO = 0.0
Y_LO = 0.0
X_HI = 8626.0
Y_HI = 8872.0

# Epoch for synthetic timestamps: 2016-11-01T00:00:00Z in epoch millis.
EPOCH_MS = 1477958400000

# Workload shape.
QUERY_RADIUS = 20.0      # query rect half-width (ToInputItemFlatMap.java:34)
QUERY_RATIO = 150        # 1 query per 150 docs (conf.properties:10)
WINDOW_MS = 60_000       # tumbling window (StreamingJob.java:134)
LOGIC_WINDOW = 8         # logical horizon in windows (LocalTreePF.java:69)
MAX_SEGMENT = 400.0      # max axis span of a valid segment (Constants.java:24)

# Hierarchical cell resolutions (bits per axis).  The reference uses a flat
# 128x128 grid (gridDensity=127); we use the same fine resolution plus a
# coarse level for the two-level grid index.
COARSE_BITS = 4          # 16 x 16
FINE_BITS = 7            # 128 x 128  (= gridDensity + 1)

# Join-routing resolution.  Finer than the density grid on purpose: candidate
# pairs in a hot cell scale as docs_per_cell * queries_per_cell, so with
# clustered data a 1024x1024 routing grid prunes ~5x more candidates than the
# reference's 128x128 (measured at sf0.1: 30.2M -> 6.7M candidates) at the
# cost of a few extra covering cells per query rect.
JOIN_BITS = 10           # 1024 x 1024

# Default tile zoom for raster-tile <-> vector assignment (FIXTURES.md §5).
TILE_ZOOM = 4            # 16 x 16 tiles


@dataclass(frozen=True)
class Region:
    """Axis-aligned working region for cell math."""

    x_lo: float = X_LO
    y_lo: float = Y_LO
    x_hi: float = X_HI
    y_hi: float = Y_HI

    @property
    def width(self) -> float:
        return self.x_hi - self.x_lo

    @property
    def height(self) -> float:
        return self.y_hi - self.y_lo


DEFAULT_REGION = Region()
