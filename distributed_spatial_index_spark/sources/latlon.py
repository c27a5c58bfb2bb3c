"""Lon/lat track-point CSV ingestion — the reference's taxi replay format.

TrackPointElem.java:33-67 accepts two line shapes:
  comma: ``TID,yyyy-MM-dd HH:mm:ss,lon,lat``  (field 1 holds date+time)
  tab:   ``TID\\tyyyy-MM-dd\\tHH:mm:ss\\tlon\\tlat``
truncates the timestamp to whole seconds, projects lon/lat through the
ellipsoidal Mercator (ClassMct.LBToXY) and silently drops rows that fail
to parse or project outside [0, 2e8] on either axis (the ``data[0]=0``
invalid marker).  This loader is the column-expression twin: one text scan,
pure built-in expressions, malformed rows filtered — no per-row Python.

Timestamps parse in the Spark session time zone (the engine pins UTC); the
reference used the JVM default locale, a deployment detail, not semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_spatial_index_spark.functions.geometry import lbtoxy

_COORD_MAX = 2e8  # ClassMct output guard, TrackPointElem.java:59-61


def parse_trackpoint_lines(lines: DataFrame, column: str = "value") -> DataFrame:
    """lines(<column> string) -> (tid int, ts long epoch-millis, x, y).

    Accepts both the comma and the tab shape per line; rows whose fields
    fail to parse (non-numeric, bad date) or whose projection leaves the
    valid range are dropped, exactly like the reference's catch-and-mark.
    """
    v = F.regexp_replace(F.col(column), "\t", ",")
    p = F.split(v, ",")
    five = F.size(p) >= 5  # tab shape normalized: TID,date,time,lon,lat
    date_time = F.when(five, F.concat_ws(" ", p[1], p[2])).otherwise(p[1])
    # try_cast: NULL on malformed fields (ANSI mode would throw), matching
    # the reference's catch-and-mark row drop
    lon = F.when(five, p[3]).otherwise(p[2]).try_cast("double")
    lat = F.when(five, p[4]).otherwise(p[3]).try_cast("double")
    tid = p[0].try_cast("int")
    # try_to_timestamp -> NULL on malformed dates instead of an exception
    ts = (
        F.unix_timestamp(
            F.try_to_timestamp(date_time, F.lit("yyyy-MM-dd HH:mm:ss"))
        )
        * 1000
    )
    x, y = lbtoxy(lat, lon)
    # ClassMct.java:50-56 rejects |L| > pi, |B| > pi/2 before projecting;
    # carry lon/lat through for that bound check, then drop them
    out = lines.select(
        tid.alias("tid"),
        ts.alias("ts"),
        x.alias("x"),
        y.alias("y"),
        lon.alias("_lon"),
        lat.alias("_lat"),
    )
    return out.filter(
        F.col("tid").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("x").isNotNull()
        & F.col("y").isNotNull()
        & (F.col("_lon") >= -180.0) & (F.col("_lon") <= 180.0)
        & (F.col("_lat") >= -90.0) & (F.col("_lat") <= 90.0)
        & (F.col("x") >= 0) & (F.col("x") <= _COORD_MAX)
        & (F.col("y") >= 0) & (F.col("y") <= _COORD_MAX)
    ).drop("_lon", "_lat")


def load_trackpoints_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read the replay CSV/TSV (StreamingJob.java:121-127's text source)
    as a batch table; pair with streaming_segment_former for the stream."""
    return parse_trackpoint_lines(spark.read.text(path))


def stream_trackpoints_csv(spark: SparkSession, path: str) -> DataFrame:
    """The same parse as an unbounded file stream (one file per
    micro-batch), matching the reference's replayed text stream."""
    lines = (
        spark.readStream.format("text")
        .schema("value string")
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    return parse_trackpoint_lines(lines)
