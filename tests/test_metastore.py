"""Versioned atomic metadata commits (sources/metastore.py): the layouts'
manifest/density artifacts must swap as ONE consistent unit under the
pointer protocol — a reader resolves the previous committed version or
the new one, never a mixture or a torn directory."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from distributed_spatial_index_spark.sources.metastore import (
    meta_commit,
    meta_read,
    meta_vacuum,
    meta_version,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v int")


def test_commit_read_roundtrip_and_versioning(spark):
    with tempfile.TemporaryDirectory() as d:
        assert meta_version(d) is None
        with pytest.raises(ValueError, match="no committed metadata"):
            meta_read(spark, d, "manifest")

        assert meta_commit(d, {"manifest": _df(spark, [(1, 10)])}) == 1
        assert meta_version(d) == 1
        assert meta_read(spark, d, "manifest").collect()[0]["v"] == 10

        assert meta_commit(d, {"manifest": _df(spark, [(1, 20)])}) == 2
        assert meta_read(spark, d, "manifest").collect()[0]["v"] == 20


def test_multi_artifact_commit_is_one_unit(spark):
    """Both artifacts land under ONE version dir before the pointer
    moves, and a reader pinning the version gets a consistent pair even
    if a new commit lands between its two reads."""
    with tempfile.TemporaryDirectory() as d:
        meta_commit(d, {"manifest": _df(spark, [(1, 1)]),
                        "density": _df(spark, [(1, 100)])})
        v = meta_version(d)
        man = meta_read(spark, d, "manifest", version=v)
        # a concurrent writer commits version 2...
        meta_commit(d, {"manifest": _df(spark, [(1, 2)]),
                        "density": _df(spark, [(1, 200)])})
        # ...but the pinned reader still pairs v1's artifacts
        dens = meta_read(spark, d, "density", version=v)
        assert man.collect()[0]["v"] == 1
        assert dens.collect()[0]["v"] == 100
        # an unpinned reader sees the new consistent pair
        assert meta_read(spark, d, "manifest").collect()[0]["v"] == 2


def test_crashed_commit_is_invisible_then_overwritten(spark):
    """A crash BEFORE the pointer swing (the only non-atomic window)
    leaves a garbage version dir: readers never see it, and the next
    commit reclaims the same version number."""
    with tempfile.TemporaryDirectory() as d:
        meta_commit(d, {"manifest": _df(spark, [(1, 1)])})
        # simulate a crashed v2: data written, pointer never moved
        _df(spark, [(9, 999)]).write.parquet(f"{d}/_meta/v000002/manifest")
        assert meta_version(d) == 1
        assert meta_read(spark, d, "manifest").collect()[0]["v"] == 1
        # the retry commits cleanly INTO the garbage slot
        assert meta_commit(d, {"manifest": _df(spark, [(1, 2)])}) == 2
        assert meta_read(spark, d, "manifest").collect()[0]["v"] == 2


def test_torn_pointer_impossible_via_rename(spark):
    """The pointer is temp-file + os.replace: after any commit there is
    never a .tmp residue and the pointer parses as complete JSON."""
    with tempfile.TemporaryDirectory() as d:
        meta_commit(d, {"manifest": _df(spark, [(1, 1)])})
        assert not os.path.exists(f"{d}/_meta_ptr.tmp")
        with open(f"{d}/_meta_ptr") as f:
            ptr = json.load(f)
        assert ptr == {"version": 1, "artifacts": ["manifest"]}


def test_vacuum_keeps_current_and_recent(spark):
    with tempfile.TemporaryDirectory() as d:
        for i in range(1, 5):
            meta_commit(d, {"manifest": _df(spark, [(1, i)])})
        assert meta_vacuum(d, keep=2) == 2  # v1, v2 removed
        assert sorted(os.listdir(f"{d}/_meta")) == ["v000003", "v000004"]
        assert meta_read(spark, d, "manifest").collect()[0]["v"] == 4
        with pytest.raises(ValueError, match="keep"):
            meta_vacuum(d, keep=0)


def test_bucketed_metadata_commits_atomically(spark):
    """Integration: write_bucketed_manifest + update_bucketed_manifest
    produce manifest AND density from the same committed version, and an
    incremental update bumps the version exactly once (one atomic swap
    per repair, not one per artifact)."""
    from distributed_spatial_index_spark.plans.bucketing import (
        update_bucketed_manifest,
        write_bucketed_manifest,
        write_bucketed_points,
    )
    from distributed_spatial_index_spark.sources import tables as src
    from tests.conftest import SF_DIR

    pts = src.geo_points(spark, SF_DIR, "lineitem")
    try:
        with tempfile.TemporaryDirectory() as d:
            write_bucketed_points(pts, "t_meta_pts", f"{d}/pts", n_buckets=4)
            write_bucketed_manifest(spark, "t_meta_pts")
            v1 = meta_version(f"{d}/pts")
            assert sorted(os.listdir(f"{d}/pts/_meta/v{v1:06d}")) == [
                "density", "manifest",
            ]

            rows = spark.createDataFrame(
                spark.table("t_meta_pts").limit(3).collect(),
                spark.table("t_meta_pts").schema,
            )
            rows.write.insertInto("t_meta_pts")
            assert update_bucketed_manifest(spark, "t_meta_pts") > 0
            assert meta_version(f"{d}/pts") == v1 + 1
            # retention: the pre-repair version is still a readable,
            # consistent pair until vacuumed
            old = meta_read(spark, f"{d}/pts", "manifest", version=v1)
            assert old.count() > 0
            assert meta_vacuum(f"{d}/pts", keep=1) == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS t_meta_pts")
