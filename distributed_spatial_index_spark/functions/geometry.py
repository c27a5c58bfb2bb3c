"""Geometry predicates/constructors as Spark column expressions.

Mirrors the reference's Rectangle/Point method surface (SURVEY.md §2.6):
- epsilon-padded MBR intersection (Rectangle.java:280-289),
- rect extension by radius (Rectangle.java:149-155),
- MBR center (Rectangle.java:116-118), L2 distance (Point.java:59-61),
all with the reference's 1e-5 epsilon (Constants.java:17).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from distributed_spatial_index_spark.config import EPSILON


def rects_intersect(
    axmin: Column, aymin: Column, axmax: Column, aymax: Column,
    bxmin: Column, bymin: Column, bxmax: Column, bymax: Column,
    eps: float = EPSILON,
) -> Column:
    """Epsilon-padded MBR intersection predicate (Rectangle.java:280-289)."""
    e = F.lit(eps)
    return (
        (axmin <= bxmax + e) & (bxmin <= axmax + e)
        & (aymin <= bymax + e) & (bymin <= aymax + e)
    )


def rects_intersect_sql(
    a: tuple[str, str, str, str], b: tuple[str, str, str, str], eps: float = EPSILON
) -> str:
    """DuckDB-compatible SQL form of :func:`rects_intersect` (same op order)."""
    axmin, aymin, axmax, aymax = a
    bxmin, bymin, bxmax, bymax = b
    return (
        f"({axmin} <= {bxmax} + {eps!r} AND {bxmin} <= {axmax} + {eps!r} "
        f"AND {aymin} <= {bymax} + {eps!r} AND {bymin} <= {aymax} + {eps!r})"
    )


def rect_contains_point(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column,
    px: Column, py: Column, eps: float = EPSILON,
) -> Column:
    """Epsilon-padded point containment (Rectangle.java:350-359)."""
    e = F.lit(eps)
    return (px >= xmin - e) & (px <= xmax + e) & (py >= ymin - e) & (py <= ymax + e)


def extend_rect(x: Column, y: Column, radius: float) -> list[Column]:
    """Square of half-width ``radius`` around a point (Rectangle.java:149-155).

    Returns [xmin, ymin, xmax, ymax] columns.
    """
    r = F.lit(radius)
    return [x - r, y - r, x + r, y + r]


def center(lo: Column, hi: Column) -> Column:
    """Midpoint of an MBR axis (Rectangle.java:116-118)."""
    return (lo + hi) / F.lit(2.0)


def dist2(ax: Column, ay: Column, bx: Column, by: Column) -> Column:
    """Squared L2 distance (Point.java:59-61 without the sqrt)."""
    dx = ax - bx
    dy = ay - by
    return dx * dx + dy * dy


# Web-Mercator sphere radius (the standard EPSG:3857 constant).
_MERCATOR_R = 6378137.0


def mercator_xy(lon: Column, lat: Column) -> tuple[Column, Column]:
    """lon/lat degrees -> Web-Mercator meters, as column expressions (the
    vectorized replacement for the reference's per-point projection,
    ClassMct.java:38-99)."""
    x = F.radians(lon) * F.lit(_MERCATOR_R)
    y = F.log(F.tan(F.lit(3.141592653589793 / 4.0) + F.radians(lat) / F.lit(2.0))) * F.lit(
        _MERCATOR_R
    )
    return x, y


def mercator_xy_np(lon, lat):
    import numpy as np

    x = np.radians(lon) * _MERCATOR_R
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * _MERCATOR_R
    return x, y


# --- the reference's exact ellipsoidal Mercator (ClassMct.java) -------------

# WGS-84 axes in km and the DIDI-CD frame: standard latitude 30 deg,
# central meridian ~104 deg E (Chengdu) — ClassMct.java:9-12.
_MCT_A = 6378.137
_MCT_B = 6356.752314
_MCT_B0 = 0.5235987755982988
_MCT_L0 = 1.8151424220741026

import math as _math  # noqa: E402

_MCT_E = _math.sqrt(1.0 - (_MCT_B / _MCT_A) * (_MCT_B / _MCT_A))
_MCT_E2 = _math.sqrt((_MCT_A / _MCT_B) * (_MCT_A / _MCT_B) - 1.0)
_MCT_NB0 = ((_MCT_A * _MCT_A) / _MCT_B) / _math.sqrt(
    1.0 + _MCT_E2 * _MCT_E2 * _math.cos(_MCT_B0) * _math.cos(_MCT_B0)
)
_MCT_K = _MCT_NB0 * _math.cos(_MCT_B0)
_MCT_Y0 = _MCT_K * _math.log(
    _math.tan(_math.pi / 4.0 + _MCT_B0 / 2.0)
    * ((1.0 - _MCT_E * _math.sin(_MCT_B0)) / (1.0 + _MCT_E * _math.sin(_MCT_B0)))
    ** (_MCT_E / 2.0)
)


def lbtoxy(lat: Column, lon: Column) -> tuple[Column, Column]:
    """The reference's ellipsoidal Mercator, op-for-op
    (ClassMct.LBToXY, ClassMct.java:38-99): x = 1000*K*(L-L0),
    y = 1000*K*(m(B) - m(B0)) with m the isometric-latitude term; meters.
    The derived constants (e, K, y0) are precomputed driver-side in the
    same double arithmetic the Java runs."""
    B = F.radians(lat)
    L = F.radians(lon)
    s = F.sin(B)
    m = F.log(
        F.tan(F.lit(_math.pi / 4.0) + B / F.lit(2.0))
        * F.pow(
            (F.lit(1.0) - F.lit(_MCT_E) * s) / (F.lit(1.0) + F.lit(_MCT_E) * s),
            F.lit(_MCT_E / 2.0),
        )
    )
    x = F.lit(_MCT_K) * (L - F.lit(_MCT_L0)) * F.lit(1000.0)
    y = (F.lit(_MCT_K) * m - F.lit(_MCT_Y0)) * F.lit(1000.0)
    return x, y


def lbtoxy_np(lat, lon):
    import numpy as np

    B = np.radians(lat)
    L = np.radians(lon)
    s = np.sin(B)
    m = np.log(
        np.tan(np.pi / 4.0 + B / 2.0)
        * ((1.0 - _MCT_E * s) / (1.0 + _MCT_E * s)) ** (_MCT_E / 2.0)
    )
    x = _MCT_K * (L - _MCT_L0) * 1000.0
    y = (_MCT_K * m - _MCT_Y0) * 1000.0
    return x, y
