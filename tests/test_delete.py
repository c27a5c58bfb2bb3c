"""Copy-on-write DELETE over the landed bucketed layout
(plans/delete.py): only the files holding matched rows are rewritten,
results stay exact for every landed reader, the incremental metadata
repair equals a full recompute, and every injected crash window settles
through resume_bucketed_delete with no duplicates and no loss."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from distributed_spatial_index_spark.operators.range_join import point_range_join
from distributed_spatial_index_spark.plans.bucketing import (
    bucketed_point_range_join,
    compact_bucketed_table,
    count_exchanges,
    pruned_bucketed_point_range_join,
    update_bucketed_manifest,
    write_bucketed_manifest,
    write_bucketed_points,
    write_bucketed_query_cells,
)
from distributed_spatial_index_spark.plans.delete import (
    delete_from_bucketed_table,
    read_delete_journal,
    resume_bucketed_delete,
)
from distributed_spatial_index_spark.sources import tables as src
from distributed_spatial_index_spark.sources.layout import list_data_files
from distributed_spatial_index_spark.sources.metastore import meta_read
from tests.conftest import SF_DIR

PTS = "t_del_pts"
QC = "t_del_qc"


def _land(spark, d):
    pts = src.unique_geo_points(spark, SF_DIR, "lineitem")
    write_bucketed_points(
        pts, PTS, f"{d}/pts", n_buckets=4, coarse_bits=2
    )
    write_bucketed_manifest(spark, PTS)
    return pts, f"{d}/pts"


def _rows(df):
    return sorted(tuple(r) for r in df.select("id", "x", "y").collect())


@pytest.fixture(autouse=True)
def _drop_tables(spark):
    yield
    for t in (PTS, QC):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_delete_rewrites_only_affected_files_and_stays_exact(spark):
    """A partial-file spatial delete: only the matched pcell's files are
    rewritten (every other file survives byte-identical at its old
    path), every landed reader stays value-exact against the retained
    rows, the join plan stays Exchange-free, and the INCREMENTAL
    metadata repair equals a full write_bucketed_manifest recompute."""
    from distributed_spatial_index_spark.operators.knn import knn, knn_landed

    qs = src.range_queries(spark, SF_DIR, "lineitem")
    kq = src.knn_queries(spark, SF_DIR, "lineitem").limit(10)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        with tempfile.TemporaryDirectory() as d:
            _, path = _land(spark, d)
            pc0 = spark.table(PTS).groupBy("pcell").count().orderBy(
                F.desc("count")
            ).first()["pcell"]
            pred = (F.col("pcell") == pc0) & (F.col("id") % 2 == 0)
            remaining = spark.table(PTS).filter(
                ~F.coalesce(pred, F.lit(False))
            ).select("id", "x", "y").toPandas()

            before = set(list_data_files(spark, path))
            stats = delete_from_bucketed_table(spark, PTS, pred)
            after = set(list_data_files(spark, path))

            assert stats["rows_deleted"] > 0
            assert 0 < stats["files_rewritten"] < len(before)
            # copy-on-write: removed files all belong to the matched
            # pcell; every other file survives at its old path
            removed = before - after
            assert len(removed) == stats["files_rewritten"]
            assert all(f"pcell={pc0}" in f for f in removed)
            assert (before - removed) <= after

            got = _rows(spark.table(PTS))
            assert got == sorted(map(tuple, remaining.itertuples(index=False)))

            # landed readers: exact and (for the join) still Exchange-free
            rem_df = spark.createDataFrame(remaining)
            write_bucketed_query_cells(qs, QC, f"{d}/qc", n_buckets=4)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            out = bucketed_point_range_join(spark, PTS, QC)
            assert count_exchanges(out) == 1
            expect = sorted(
                map(tuple, point_range_join(rem_df, qs).collect())
            )
            assert sorted(map(tuple, out.collect())) == expect
            sel = pruned_bucketed_point_range_join(spark, PTS, QC)
            assert sorted(map(tuple, sel.collect())) == expect
            assert sel.prune_stats["files_total"] == len(after)
            a = sorted(map(tuple, knn(rem_df, kq, k=3).collect()))
            b = sorted(map(tuple, knn_landed(spark, PTS, kq, k=3).collect()))
            assert a == b and len(a) > 0

            # incremental repair == full recompute (manifest AND density)
            man_inc = sorted(map(tuple, meta_read(spark, path, "manifest").collect()))
            dens_inc = sorted(map(tuple, meta_read(spark, path, "density").collect()))
            write_bucketed_manifest(spark, PTS)
            assert man_inc == sorted(
                map(tuple, meta_read(spark, path, "manifest").collect())
            )
            assert dens_inc == sorted(
                map(tuple, meta_read(spark, path, "density").collect())
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_delete_null_predicate_rows_retained_and_noop_delete(spark):
    """SQL DELETE semantics: rows where the predicate is NULL are
    RETAINED, not silently dropped; and a predicate matching nothing is
    a clean no-op (no journal, no rewrite, metadata version
    unchanged)."""
    with tempfile.TemporaryDirectory() as d:
        _, path = _land(spark, d)
        total = spark.table(PTS).count()
        v0 = meta_read(spark, path, "manifest").count()

        # NULL for id % 3 != 0 (no otherwise branch) — only TRUE deletes
        pred = F.when(F.col("id") % 3 == 0, F.lit(True))
        matched = spark.table(PTS).filter(pred).count()
        stats = delete_from_bucketed_table(spark, PTS, pred)
        assert stats["rows_deleted"] == matched
        assert spark.table(PTS).count() == total - matched
        assert spark.table(PTS).filter(F.col("id") % 3 == 0).count() == 0

        noop = delete_from_bucketed_table(spark, PTS, F.col("id") < 0)
        assert noop == {
            "files_rewritten": 0,
            "files_new": 0,
            "rows_deleted": 0,
            "meta_version": stats["meta_version"],
        }
        assert read_delete_journal(path) is None
        assert v0 > 0  # the landed table was manifested to begin with


def test_delete_whole_partition_removes_files_without_rewrite(spark):
    """Deleting everything in a pcell removes its files outright: no
    retained rows to re-insert (files_new may be 0), the directory's
    docs vanish from the table, and the manifest no longer references
    the removed files."""
    with tempfile.TemporaryDirectory() as d:
        _, path = _land(spark, d)
        pc0 = spark.table(PTS).select("pcell").distinct().first()["pcell"]
        gone = spark.table(PTS).filter(F.col("pcell") == pc0).count()
        stats = delete_from_bucketed_table(
            spark, PTS, F.col("pcell") == pc0
        )
        assert stats["rows_deleted"] == gone > 0
        assert stats["files_new"] == 0
        assert spark.table(PTS).filter(F.col("pcell") == pc0).count() == 0
        man = meta_read(spark, path, "manifest")
        assert man.filter(
            F.col("file_path").contains(f"pcell={pc0}")
        ).count() == 0
        assert man.count() == len(list_data_files(spark, path))


def test_delete_refuses_stale_manifest(spark):
    """An un-manifested append makes the incremental repair's arithmetic
    wrong, so the delete refuses until the manifest is settled — then
    succeeds."""
    with tempfile.TemporaryDirectory() as d:
        _, path = _land(spark, d)
        # materialized rows — Spark refuses insert-from-self
        extra = spark.createDataFrame(
            spark.table(PTS).limit(5).collect(),
            spark.table(PTS).schema,
        )
        extra.write.insertInto(PTS)
        spark.catalog.refreshTable(PTS)
        # the append really left un-manifested files behind
        assert len(list_data_files(spark, path)) > meta_read(
            spark, path, "manifest"
        ).count()
        with pytest.raises(ValueError, match="not exactly fresh"):
            delete_from_bucketed_table(spark, PTS, F.col("id") % 2 == 0)
        update_bucketed_manifest(spark, PTS)
        stats = delete_from_bucketed_table(spark, PTS, F.col("id") % 2 == 0)
        assert stats["rows_deleted"] > 0
        assert spark.table(PTS).filter(F.col("id") % 2 == 0).count() == 0


def test_every_crash_window_settles_through_resume(spark):
    """Drive the REAL delete code path into each injected crash window
    and settle it: while the journal is pending the manifest writers
    refuse (a crashed delete can never be double-counted); resume
    either proves the table untouched (pre-insert crash -> 'aborted',
    re-run the delete) or completes the removal and full re-manifest —
    and in EVERY window the final table is duplicate-free, loss-free,
    value-identical to the intended delete, and serves the landed
    readers fresh."""
    pred = F.col("id") % 2 == 0
    for window in ("journal1", "insert", "journal2", "remove"):
        with tempfile.TemporaryDirectory() as d:
            _, path = _land(spark, d)
            expect = _rows(spark.table(PTS).filter(~pred))
            n_expect = len(expect)

            with pytest.raises(RuntimeError, match=f"after {window}"):
                delete_from_bucketed_table(
                    spark, PTS, pred, _fail_after=window
                )
            assert read_delete_journal(path) is not None
            with pytest.raises(ValueError, match="unsettled"):
                write_bucketed_manifest(spark, PTS)
            with pytest.raises(ValueError, match="unsettled"):
                update_bucketed_manifest(spark, PTS)
            # compaction reads the path directly — rewriting an
            # unsettled delete's retained copies would bake duplicate
            # ROWS into the new layout, so it refuses hardest of all
            with pytest.raises(ValueError, match="unsettled"):
                compact_bucketed_table(spark, PTS, f"{d}/pts_v2")

            res = resume_bucketed_delete(spark, PTS)
            assert res["resumed"], (window, res)
            assert read_delete_journal(path) is None
            if res["action"] == "aborted":
                # pre-insert crash: table untouched — re-run the delete
                assert window == "journal1"
                assert delete_from_bucketed_table(
                    spark, PTS, pred
                )["rows_deleted"] > 0
            else:
                assert window != "journal1"

            got = spark.table(PTS)
            assert _rows(got) == expect, window  # no dupes, no loss
            assert got.count() == n_expect
            # metadata settled: fresh manifest, idempotent resume
            man = meta_read(spark, path, "manifest")
            assert man.count() == len(list_data_files(spark, path))
            assert resume_bucketed_delete(spark, PTS) == {
                "resumed": False,
                "action": "none",
            }
            spark.sql(f"DROP TABLE IF EXISTS {PTS}")


def test_delete_composes_with_stream_land_append_and_compact(spark):
    """The full lifecycle on ONE table — stream-landed (multi-file
    batches), then DELETE, then INSERT INTO append (+ incremental
    manifest), then compaction — with the landed join exact against a
    from-scratch recomputation at the end.  The delete must handle
    stream-landed file layouts (several files per (pcell, bucket)), and
    every later verb must accept the delete's rewritten state."""
    from tests.test_land import _chunked_stream

    from distributed_spatial_index_spark.streaming.land import (
        stream_land_points,
    )

    pts = src.unique_geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    with tempfile.TemporaryDirectory() as d:
        q = stream_land_points(
            _chunked_stream(spark, pts, d), PTS, f"{d}/pts",
            f"{d}/ckpt", n_buckets=4, coarse_bits=2,
        )
        q.awaitTermination(300)
        assert not q.isActive and q.exception() is None

        # DELETE from the stream-landed (multi-file) layout
        stats = delete_from_bucketed_table(spark, PTS, F.col("id") % 3 == 0)
        assert stats["rows_deleted"] > 0

        # append THROUGH the table, repair incrementally (the freshness
        # precondition the delete left behind must hold)
        extra = spark.createDataFrame(
            spark.table(PTS).limit(7).collect(), spark.table(PTS).schema
        )
        extra.write.insertInto(PTS)
        assert update_bucketed_manifest(spark, PTS) > 0

        # compact pays the stream's + delete's file debt; spec survives
        before, after = compact_bucketed_table(spark, PTS, f"{d}/pts_v2")
        assert after < before

        expect_pts = spark.createDataFrame(
            spark.table(PTS).select("id", "x", "y").collect(),
            "id long, x double, y double",
        )
        write_bucketed_query_cells(qs, QC, f"{d}/qc", n_buckets=4)
        got = sorted(map(tuple, bucketed_point_range_join(
            spark, PTS, QC).collect()))
        assert got == sorted(map(tuple, point_range_join(
            expect_pts, qs).collect())) and len(got) > 0
        sel = pruned_bucketed_point_range_join(spark, PTS, QC)
        assert sorted(map(tuple, sel.collect())) == got  # manifest fresh


def test_delete_from_salted_and_query_cells_tables(spark):
    """The delete's bucket-parity machinery under the (cell, salt) spec,
    and the query-table kind (no density artifact): retiring standing
    queries is a delete too."""
    from distributed_spatial_index_spark.config import JOIN_BITS
    from distributed_spatial_index_spark.operators.density import density_grid
    from distributed_spatial_index_spark.plans.partitioning import (
        hot_cells_from_density,
    )

    pts = src.unique_geo_points(spark, SF_DIR, "lineitem")
    qs = src.range_queries(spark, SF_DIR, "lineitem")
    hot = hot_cells_from_density(density_grid(pts, bits=JOIN_BITS), threshold=1)
    assert hot
    with tempfile.TemporaryDirectory() as d:
        write_bucketed_points(
            pts, PTS, f"{d}/pts", n_buckets=4, hot=hot, n_salt=4
        )
        write_bucketed_manifest(spark, PTS)
        n0 = spark.table(PTS).count()
        stats = delete_from_bucketed_table(spark, PTS, F.col("id") % 5 == 0)
        assert stats["rows_deleted"] > 0
        assert spark.table(PTS).count() == n0 - stats["rows_deleted"]
        assert spark.table(PTS).filter(F.col("id") % 5 == 0).count() == 0
        # the repaired manifest equals a full recompute (parity checks
        # ran under the salted (cell, salt) bucket key)
        path = f"{d}/pts"
        man_inc = sorted(map(tuple, meta_read(spark, path, "manifest").collect()))
        write_bucketed_manifest(spark, PTS)
        assert man_inc == sorted(
            map(tuple, meta_read(spark, path, "manifest").collect())
        )

        # query-cells table: delete retires standing queries (no density
        # artifact in the repair)
        write_bucketed_query_cells(qs, QC, f"{d}/qc", n_buckets=4)
        write_bucketed_manifest(spark, QC)
        gone = [r["query_id"] for r in qs.limit(3).collect()]
        qstats = delete_from_bucketed_table(
            spark, QC, F.col("query_id").isin(gone)
        )
        assert qstats["rows_deleted"] > 0
        assert spark.table(QC).filter(
            F.col("query_id").isin(gone)
        ).count() == 0
        assert meta_read(spark, f"{d}/qc", "manifest").count() == len(
            list_data_files(spark, f"{d}/qc")
        )


def test_delete_refuses_nondeterministic_predicate(spark):
    """The predicate is evaluated in two independent scans; a
    non-deterministic one would re-roll between them and silently
    corrupt the table — the delete refuses it up front (review
    finding)."""
    with tempfile.TemporaryDirectory() as d:
        _land(spark, d)
        n0 = spark.table(PTS).count()
        with pytest.raises(ValueError, match="non-deterministic"):
            delete_from_bucketed_table(spark, PTS, F.rand() < 0.5)
        assert spark.table(PTS).count() == n0  # untouched, no journal
        path = f"{d}/pts"
        assert read_delete_journal(path) is None
