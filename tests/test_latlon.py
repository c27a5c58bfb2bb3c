"""Lon/lat CSV ingestion (TrackPointElem.java:33-67 + ClassMct.LBToXY):
both line shapes parse, invalid rows drop, the projection matches the
NumPy twin bit-for-bit, and the loaded points drive the segment former
end to end."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from distributed_spatial_index_spark.functions.geometry import lbtoxy_np
from distributed_spatial_index_spark.operators.segments import form_segments
from distributed_spatial_index_spark.sources.latlon import load_trackpoints_csv


def _write_csv(tmp_path):
    lines = [
        "7,2016-11-01 08:30:15,104.066,30.02",       # comma shape
        "7,2016-11-01 08:31:15,104.07,30.022",
        "8\t2016-11-01\t09:00:00\t104.05\t30.01",    # tab shape
        "8\t2016-11-01\t09:01:00\t104.052\t30.011",
        "bogus,not-a-date,104.0,30.6",               # bad date -> dropped
        "9,2016-11-01 10:00:00,999.0,30.6",          # |L| > pi -> rejected
        "malformed line without commas",
    ]
    p = tmp_path / "track.csv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_parse_shapes_and_projection(spark, tmp_path):
    got = load_trackpoints_csv(spark, _write_csv(tmp_path)).orderBy("ts").collect()
    assert [r["tid"] for r in got] == [7, 7, 8, 8]
    # second-truncated epoch millis, session TZ = UTC
    assert got[0]["ts"] == 1477989015000 and got[0]["ts"] % 1000 == 0
    lons = np.array([104.066, 104.07, 104.05, 104.052])
    lats = np.array([30.02, 30.022, 30.01, 30.011])
    # 1e-6 m tolerance: JVM StrictMath vs NumPy libm differ in final ULPs
    x, y = lbtoxy_np(lats, lons)
    order = np.argsort([0, 1, 2, 3])  # rows already time-ordered per write
    for r, xi, yi in zip(sorted(got, key=lambda r: (r["tid"], r["ts"])),
                         x[order], y[order]):
        assert math.isclose(r["x"], xi, rel_tol=0.0, abs_tol=1e-6), (r["x"], xi)
        assert math.isclose(r["y"], yi, rel_tol=0.0, abs_tol=1e-6), (r["y"], yi)


def test_projection_plausible_frame(spark, tmp_path):
    """The DIDI-CD frame: points near (104E, 30.0N) land inside the
    reference's 8626x8872 working region."""
    got = load_trackpoints_csv(spark, _write_csv(tmp_path)).collect()
    for r in got:
        assert 0 <= r["x"] <= 8626 and 0 <= r["y"] <= 8872, (r["x"], r["y"])


def test_trackpoint_gate_stays_in_codegen(spark):
    """The whole gate path (synthetic line build -> parse -> Mercator ->
    aggregate) must COMPILE — with codegen fallback disabled, a plan that
    exceeds Janino's 64 KB method limit fails instead of silently running
    interpreted.  Pins the localCheckpoint stage split + the single-shape
    parser rewrite."""
    from distributed_spatial_index_spark.sources.latlon import (
        parse_trackpoints_gate,
    )

    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    try:
        spark.conf.set("spark.sql.codegen.fallback", "false")
        # sf0.01, the driver gate's sf: at sf0.001 every derived lon falls
        # west of the projection origin (x < 0) and ALL rows drop — 0 rows
        # would not witness that the compiled plan actually produced output
        n = parse_trackpoints_gate(spark, "/root/testdata/sf0.01").count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_segments_from_csv(spark, tmp_path):
    pts = load_trackpoints_csv(spark, _write_csv(tmp_path)).withColumn(
        "seq", F.col("ts")
    )
    segs = form_segments(pts).collect()
    # two tids, two points each -> one segment per tid
    assert sorted(s["tid"] for s in segs) == [7, 8]
