"""Property-based check (hypothesis): the cell-routed range join equals the
brute-force oracle on arbitrary small inputs — points on cell boundaries,
degenerate rects, out-of-region coordinates, duplicate ids."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from distributed_spatial_index_spark.config import EPSILON, X_HI, Y_HI
from distributed_spatial_index_spark.operators.range_join import point_range_join

coord_x = st.one_of(
    st.floats(min_value=-50.0, max_value=X_HI + 50.0, allow_nan=False),
    st.sampled_from([0.0, X_HI, X_HI / 2, 67.390625, 67.390625 + 1e-5]),
)
coord_y = st.one_of(
    st.floats(min_value=-50.0, max_value=Y_HI + 50.0, allow_nan=False),
    st.sampled_from([0.0, Y_HI, Y_HI / 2, 69.3125]),
)

points_st = st.lists(
    st.tuples(st.integers(0, 20), coord_x, coord_y), min_size=1, max_size=25
)
queries_st = st.lists(
    st.tuples(st.integers(0, 10), coord_x, coord_y,
              st.floats(min_value=0.0, max_value=300.0, allow_nan=False)),
    min_size=1, max_size=6,
)


@settings(max_examples=25, deadline=None)
@given(points=points_st, queries=queries_st)
def test_range_join_matches_bruteforce(spark_prop, points, queries):
    spark = spark_prop
    pts = spark.createDataFrame(
        [(i, float(x), float(y), 0) for i, x, y in points],
        "id long, x double, y double, ts long",
    )
    qs = spark.createDataFrame(
        [(q, x - r, y - r, x + r, y + r) for q, x, y, r in queries],
        "query_id long, xmin double, ymin double, xmax double, ymax double",
    )
    got = {tuple(r) for r in point_range_join(pts, qs).collect()}
    expect = set()
    for q, qx, qy, r in queries:
        for i, x, y in points:
            if (qx - r - EPSILON <= x <= qx + r + EPSILON
                    and qy - r - EPSILON <= y <= qy + r + EPSILON):
                expect.add((q, i))
    assert got == expect


# session fixture alias so hypothesis doesn't see a function-scoped fixture
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_prop(spark):
    return spark