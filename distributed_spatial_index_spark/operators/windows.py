"""Event-time windowed aggregations & sessionization over the events table.

The reference's universal operator shape is keyBy + tumbling window +
process (SURVEY.md A2, StreamingJob.java:130-214) and a diagnostic
10-minute count-by-type window (A1, StreamingJob.java:54-76).  Batch
equivalents: groupBy(window(...)) — one shuffle, map-side partial aggs.

Money sums use integer cents (sum of round(value*100)) so aggregation
order can't produce ULP drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_type_counts(events: DataFrame, minutes: int = 10) -> DataFrame:
    """(win_start, event_type, n, sum_cents): tumbling-window counts per
    type (A1's count-by-type, generalized)."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.groupBy(
            F.window(ts, f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_cents")
    )


def windowed_type_counts_sql(minutes: int = 10) -> str:
    return f"""
        SELECT time_bucket(INTERVAL {minutes} MINUTE, ts) AS win_start,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events GROUP BY 1, 2
    """


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, n_events, start_ts, end_ts): gap-based sessions
    via lag + cumulative sum (the batch form of session windows)."""
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    gap = F.lit(gap_minutes * 60_000)
    marked = events.select(
        "user_id", "event_id", ts_ms.alias("tms")
    ).withColumn(
        "new_session",
        F.when(
            (F.col("tms") - F.lag("tms").over(w)) > gap, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum(
            F.when(F.lag("tms").over(w).isNull(), F.lit(1)).otherwise(
                F.col("new_session")
            )
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("tms").alias("start_ts"),
        F.max("tms").alias("end_ts"),
    )


def sessionize_sql(gap_minutes: int = 30) -> str:
    gap = gap_minutes * 60_000
    return f"""
        WITH m AS (
            SELECT user_id, event_id, epoch_ms(ts) AS tms,
                   CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
                        WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {gap}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
        ), s AS (
            SELECT user_id, tms,
                   -- CAST: DuckDB window sum(INT) is HUGEINT; Spark long
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY tms, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM m
        )  -- both engines order by (tms, event_id); tms ties broken by id
        SELECT user_id, session_id, count(*) AS n_events,
               min(tms) AS start_ts, max(tms) AS end_ts
        FROM s GROUP BY 1, 2
    """


def lineitem_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped rollup (cents-exact): shows the engine covers plain
    OLAP aggregation alongside the spatial ops."""
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integral doubles -> exact long sum
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents("l_extendedprice")).alias("sum_price_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def lineitem_pricing_summary_sql() -> str:
    return """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_price_cents,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1, 2
    """
