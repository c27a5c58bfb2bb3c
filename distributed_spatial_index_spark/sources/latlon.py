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

import math as _math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_spatial_index_spark.functions import geometry as _geo
from distributed_spatial_index_spark.functions.geometry import lbtoxy

_COORD_MAX = 2e8  # ClassMct output guard, TrackPointElem.java:59-61


def parse_trackpoint_lines(lines: DataFrame, column: str = "value") -> DataFrame:
    """lines(<column> string) -> (tid int, ts long epoch-millis, x, y).

    Accepts both the comma and the tab shape per line; rows whose fields
    fail to parse (non-numeric, bad date) or whose projection leaves the
    valid range are dropped, exactly like the reference's catch-and-mark.
    """
    # Normalize BOTH line shapes to one 5-field form before splitting:
    # tabs -> commas, then the comma shape's "date time" field is split on
    # the space following a date literal (only that space — padded numeric
    # fields still parse via try_cast's trim, like Java's parseDouble).
    # One shape means NO per-field when(five, ...) branching: the expression
    # tree halves, which keeps the fused gate plan (line build + parse +
    # Mercator + count) inside Janino's 64 KB method limit —
    # tests/test_latlon.py::test_trackpoint_gate_stays_in_codegen pins it.
    v = F.regexp_replace(F.col(column), "\t", ",")
    v = F.regexp_replace(v, r"(\d{4}-\d{2}-\d{2}) ", "$1,")
    p = F.split(v, ",")
    # F.get (NULL on out-of-bounds) not [] (throws): a malformed short line
    # must fall through to the NULL-drop filter, exactly the reference's
    # catch-and-mark row drop (TrackPointElem.java:63-66)
    date_time = F.concat_ws(" ", F.get(p, 1), F.get(p, 2))
    # try_cast: NULL on malformed fields (ANSI mode would throw)
    lon = F.get(p, 3).try_cast("double")
    lat = F.get(p, 4).try_cast("double")
    tid = F.get(p, 0).try_cast("int")
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


# --- deterministic replay lines + true SQL twin (driver gate) ---------------
#
# The gate derives track-point LINES from the events table with pure integer
# arithmetic, formats lon/lat as exact 6-decimal strings (integer concat, no
# float printing), alternates the comma/tab line shapes, and injects
# malformed rows.  Because a 6-decimal string parses to the correctly-
# rounded double of the same rational that micro/1e6 computes, DuckDB can
# express the whole pipeline (parse + ellipsoidal Mercator + drop policy)
# directly — a true SQL twin, not an expected-parquet.  Outputs round x/y to
# whole meters so cross-engine libm ULP differences (tan/pow/log) cannot
# flip the value hash.

_LON_MOD, _LON_OFF = 60_000_000, 80_000_000   # lon in [80, 140) deg
_LAT_MOD, _LAT_OFF = 45_000_000, 10_000_000   # lat in [10, 55) deg
_BAD_EVERY = 97                                # every 97th line is garbage


def _micro_cols() -> tuple:
    eid = F.col("event_id").cast("long")
    lon_u = F.pmod(eid * F.lit(7919), F.lit(_LON_MOD)) + F.lit(_LON_OFF)
    lat_u = F.pmod(eid * F.lit(104729), F.lit(_LAT_MOD)) + F.lit(_LAT_OFF)
    return eid, lon_u, lat_u


def _dec6(micro) -> F.Column:
    """Exact 6-decimal string of micro/1e6 via integer math (no float
    formatting anywhere)."""
    return F.concat(
        (micro / F.lit(1_000_000)).cast("long").cast("string"),
        F.lit("."),
        F.lpad(F.pmod(micro, F.lit(1_000_000)).cast("string"), 6, "0"),
    )


def trackpoint_lines_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (value string) replay lines: comma shape for even event_id,
    tab shape for odd, garbage for event_id % 97 == 0."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid, lon_u, lat_u = _micro_cols()
    tid = F.col("user_id").cast("string")
    d = F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd")
    t = F.date_format(F.col("ts").cast("timestamp"), "HH:mm:ss")
    lon_s, lat_s = _dec6(lon_u), _dec6(lat_u)
    comma = F.concat_ws(",", tid, F.concat_ws(" ", d, t), lon_s, lat_s)
    tab = F.concat_ws("\t", tid, d, t, lon_s, lat_s)
    line = F.when(F.pmod(eid, F.lit(_BAD_EVERY)) == 0, F.lit("oops,not a point")) \
        .when(F.pmod(eid, F.lit(2)) == 0, comma).otherwise(tab)
    return ev.select(line.alias("value"))


def parse_trackpoints_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gated surface: build replay lines, run the production parser +
    projection + drop policy, round x/y to whole meters.

    The line table is localCheckpoint-ed first: fusing the synthetic line
    BUILD with the parse would re-inline the whole build tree into every
    parse field (filter pushdown through projects duplicates expression
    trees) and blow Janino's 64 KB method limit into interpreted fallback.
    The barrier gives two independently-codegen'd stages — exactly the
    production shape, where lines arrive from a text source scan boundary
    anyway (test_trackpoint_gate_stays_in_codegen pins both)."""
    lines = trackpoint_lines_from_events(spark, sf_dir).localCheckpoint(
        eager=False
    )
    out = parse_trackpoint_lines(lines)
    return out.select(
        F.col("tid").cast("long").alias("tid"),  # events.user_id is BIGINT
        "ts",
        F.round(F.col("x"), 0).alias("x_m"),
        F.round(F.col("y"), 0).alias("y_m"),
    )


def parse_trackpoints_oracle_sql(table: str = "events") -> str:
    """DuckDB twin: same integer lon/lat derivation, the ellipsoidal
    Mercator written op-for-op with the SAME precomputed double constants
    as functions/geometry.lbtoxy (ClassMct.java:38-99), same drop policy.
    Degrees->radians mirrors Java's Math.toRadians order (deg / 180 * pi)."""
    e, k, l0, y0 = _geo._MCT_E, _geo._MCT_K, _geo._MCT_L0, _geo._MCT_Y0
    pi = _math.pi
    return f"""
        WITH src AS (
            SELECT user_id AS tid,
                   CAST(epoch_ms(date_trunc('second', ts)) AS BIGINT) AS ts,
                   ((CAST(event_id AS BIGINT) * 7919) % {_LON_MOD}
                        + {_LON_OFF}) / 1000000.0 AS lon,
                   ((CAST(event_id AS BIGINT) * 104729) % {_LAT_MOD}
                        + {_LAT_OFF}) / 1000000.0 AS lat
            FROM {table}
            WHERE (CAST(event_id AS BIGINT) % {_BAD_EVERY}) <> 0
              -- the reference parses TID as a Java int (TrackPointElem.java:
              -- 37): an out-of-int32 id fails the parse and the row drops;
              -- mirror that so the twin holds at ANY user_id scale
              AND user_id BETWEEN -2147483648 AND 2147483647
        ), proj AS (
            SELECT tid, ts,
                   ({k!r} * ((lon / 180.0 * {pi!r}) - {l0!r})) * 1000.0 AS x,
                   ({k!r} * ln(
                        tan({pi / 4.0!r} + (lat / 180.0 * {pi!r}) / 2.0)
                        * pow((1.0 - {e!r} * sin(lat / 180.0 * {pi!r}))
                              / (1.0 + {e!r} * sin(lat / 180.0 * {pi!r})),
                              {e / 2.0!r})
                    ) - {y0!r}) * 1000.0 AS y
            FROM src
        )
        SELECT tid, ts, round(x, 0) AS x_m, round(y, 0) AS y_m
        FROM proj
        WHERE x >= 0 AND x <= {_COORD_MAX!r} AND y >= 0 AND y <= {_COORD_MAX!r}
    """


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
