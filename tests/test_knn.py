"""kNN correctness vs exact oracles (FIXTURES.md §4: exact argsort of L2
distances, ties broken by doc_id)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.knn import knn, knn_oracle_sql
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR, assert_same_rows


def test_knn_vs_numpy_oracle(spark):
    pts = src.unique_geo_points(spark, SF_DIR, "lineitem")
    qs = src.knn_queries(spark, SF_DIR, "lineitem").limit(10)
    k = 5
    got = knn(pts, qs, k=k)

    p = np.array([(r["id"], r["x"], r["y"]) for r in pts.collect()])
    rows = []
    for r in qs.collect():
        d2 = (p[:, 1] - r["x"]) ** 2 + (p[:, 2] - r["y"]) ** 2
        order = np.lexsort((p[:, 0], d2))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((r["query_id"], rank, int(p[j, 0]), float(d2[j])))
    a = sorted(tuple(x) for x in got.collect())
    b = sorted(rows)
    assert len(a) == len(b) == 10 * k
    for (qa, ra, da, d2a), (qb, rb, db, d2b) in zip(a, b):
        assert (qa, ra, da) == (qb, rb, db)
        assert abs(d2a - d2b) < 1e-6


def test_knn_vs_duckdb(spark, ddb):
    got = knn(
        src.unique_geo_points(spark, SF_DIR, "lineitem"),
        src.knn_queries(spark, SF_DIR, "lineitem"),
        k=5,
    )
    rows = ddb.execute(
        knn_oracle_sql(src.unique_geo_points_sql("lineitem"),
                       src.knn_queries_sql("lineitem"), k=5)
    ).fetchall()
    assert_same_rows(got, rows)


def test_knn_k_exceeds_candidates_in_first_ring(spark):
    """Queries in empty space must keep expanding until k are found."""
    pts = spark.createDataFrame(
        [(i, 8000.0 + i * 10.0, 8000.0, 0) for i in range(8)],
        "id long, x double, y double, ts long",
    )
    qs = spark.createDataFrame([(1, 100.0, 100.0)], "query_id long, x double, y double")
    got = knn(pts, qs, k=3, r0=16.0)
    rows = sorted(map(tuple, got.collect()))
    assert [r[2] for r in rows] == [0, 1, 2]  # nearest three by construction


def test_knn_k_values_1_and_32(spark):
    """FIXTURES.md §4: k in {1, 5, 32}; k=32 forces multi-round expansion at
    sf0.001 densities."""
    pts = src.unique_geo_points(spark, SF_DIR, "lineitem")
    qs = src.knn_queries(spark, SF_DIR, "lineitem").limit(6)
    p = np.array([(r["id"], r["x"], r["y"]) for r in pts.collect()])
    for k in (1, 32):
        got = sorted(map(tuple, knn(pts, qs, k=k).collect()))
        expect = []
        for r in qs.collect():
            d2 = (p[:, 1] - r["x"]) ** 2 + (p[:, 2] - r["y"]) ** 2
            order = np.lexsort((p[:, 0], d2))[:k]
            expect += [
                (r["query_id"], rank, int(p[j, 0])) for rank, j in enumerate(order, 1)
            ]
        assert [(q, rk, d) for q, rk, d, _ in got] == sorted(expect)


def test_knn_tie_break_by_doc_id(spark):
    pts = spark.createDataFrame(
        [(5, 110.0, 100.0), (3, 90.0, 100.0), (9, 100.0, 110.0), (1, 100.0, 90.0)],
        "id long, x double, y double",
    )
    qs = spark.createDataFrame([(1, 100.0, 100.0)], "query_id long, x double, y double")
    got = sorted(map(tuple, knn(pts, qs, k=4).collect()))
    # all at d2=100 -> rank order must be doc_id order: 1,3,5,9
    assert [(r[1], r[2]) for r in got] == [(1, 1), (2, 3), (3, 5), (4, 9)]


def test_knn_fallback_bounded_and_loud(spark):
    """Forcing stragglers (tiny r0, no ring rounds) must (a) raise when the
    straggler count exceeds fallback_cap, (b) run the bounded brute-force
    below the cap with results identical to the converged ring search, and
    (c) record both outcomes in knn.last_stats."""
    import pytest as _pytest

    from distributed_spatial_index_spark.operators import knn as knn_mod

    pts = src.unique_geo_points(spark, SF_DIR, "lineitem")
    qs = src.knn_queries(spark, SF_DIR, "lineitem")
    n_q = qs.dropDuplicates(["query_id"]).count()

    with _pytest.raises(RuntimeError, match="fallback_cap") as ei:
        knn(pts, qs, k=3, r0=1e-9, max_rounds=1, fallback_cap=n_q // 2)
    assert knn_mod.last_stats["stragglers"] == n_q
    assert not knn_mod.last_stats["fallback_used"]
    # per-call channel on the raise path: stats ride the exception
    assert ei.value.knn_stats["stragglers"] == n_q

    got = knn(pts, qs, k=3, r0=1e-9, max_rounds=1, fallback_cap=n_q)
    assert knn_mod.last_stats["fallback_used"]
    assert knn_mod.last_stats["stragglers"] == n_q
    # per-call channel on the success path: stats ride the DataFrame and
    # are NOT clobbered by a later call (the global is rebound, the
    # attached snapshot stays)
    assert got.knn_stats["fallback_used"] and got.knn_stats["stragglers"] == n_q
    expect = knn(pts, qs, k=3)
    assert not knn_mod.last_stats["fallback_used"]
    assert got.knn_stats["fallback_used"]  # snapshot survived the new call
    assert expect.knn_stats == knn_mod.last_stats
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_knn_landed_matches_knn_and_enforces_contracts(spark):
    """knn_landed (r4 verdict #4): served from the landed bucketed layout
    — persisted-cell prefix routing + committed density — it must return
    EXACTLY knn()'s rows and stats, and refuse loudly when the layout
    contract is broken (missing metadata, wrong kind, bits finer than the
    landed cell, stale manifest)."""
    import tempfile

    import pytest

    from distributed_spatial_index_spark.operators.knn import knn_landed
    from distributed_spatial_index_spark.plans.bucketing import (
        write_bucketed_manifest,
        write_bucketed_points,
        write_bucketed_query_cells,
    )

    pts = src.unique_geo_points(spark, SF_DIR, "lineitem")
    qs = src.knn_queries(spark, SF_DIR, "lineitem")
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(
                pts, "t_knnl_pts", f"{d}/pts", n_buckets=4, bits=10,
                coarse_bits=2,
            )
            # metadata not committed yet -> loud refusal, not silent derive
            with pytest.raises(ValueError, match="manifest/density"):
                knn_landed(spark, "t_knnl_pts", qs, k=5)
            write_bucketed_manifest(spark, "t_knnl_pts")

            a = knn(pts, qs, k=5)
            b = knn_landed(spark, "t_knnl_pts", qs, k=5)
            assert sorted(map(tuple, a.collect())) == sorted(
                map(tuple, b.collect())
            )
            assert a.knn_stats == b.knn_stats

            # routing bits finer than the landed cell cannot be served
            with pytest.raises(ValueError, match="exceeds the landed"):
                knn_landed(spark, "t_knnl_pts", qs, k=5, bits=11)
            # a query_cells table is not a points table
            write_bucketed_query_cells(
                src.range_queries(spark, SF_DIR, "lineitem").limit(2),
                "t_knnl_qc", f"{d}/qc", n_buckets=4,
            )
            with pytest.raises(ValueError, match="kind"):
                knn_landed(spark, "t_knnl_qc", qs, k=5)
            # staleness: an appended file invalidates the committed density
            two = spark.createDataFrame(
                spark.table("t_knnl_pts").limit(2).collect(),
                spark.table("t_knnl_pts").schema,
            )
            two.write.insertInto("t_knnl_pts")
            with pytest.raises(ValueError, match="stale"):
                knn_landed(spark, "t_knnl_pts", qs, k=5)
            # re-manifesting (one pass, both artifacts) cures it
            write_bucketed_manifest(spark, "t_knnl_pts")
            knn_landed(spark, "t_knnl_pts", qs, k=5)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_knnl_pts")
        spark.sql("DROP TABLE IF EXISTS t_knnl_qc")
