"""General relational surface (SURVEY.md §2.9: absent in the reference, so
built Spark-native per the north rule): rollup/grouping sets, semi/anti
joins, JSON extraction, date bucketing, approximate aggregates.

Each op has a DuckDB oracle twin; money sums use integer cents so
aggregation order cannot drift doubles between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotal rows included —
    grouping-set coverage."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_price_cents"
            ),
        )
    )


def pricing_rollup_sql() -> str:
    return """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               -- outer CAST: DuckDB sum(BIGINT) returns HUGEINT; Spark long
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_price_cents
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join: customers having at least one order (EXISTS)."""
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select("c_custkey", "c_mktsegment")


def customers_with_orders_sql() -> str:
    return """
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join: customers with no orders (NOT EXISTS)."""
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_mktsegment")


def customers_without_orders_sql() -> str:
    return """
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """


def customer_order_flag(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi + anti join in one gate row: every customer tagged with whether
    they have orders.  Built as the UNION of a left-semi and a left-anti
    join (NOT as an EXISTS expression) so BOTH physical join paths stay
    gate-exercised in a single driver slot (the driver caps CORRECTNESS at
    50 rows; see NOTES_r4.md)."""
    return customers_with_orders(customer, orders).withColumn(
        "has_orders", F.lit(True)
    ).unionByName(
        customers_without_orders(customer, orders).withColumn(
            "has_orders", F.lit(False)
        )
    )


def customer_order_flag_sql() -> str:
    return """
        SELECT c_custkey, c_mktsegment,
               EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey) AS has_orders
        FROM customer c
    """


def events_json_extract(events: DataFrame) -> DataFrame:
    """JSON property extraction from the events props column."""
    return events.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )


def events_json_extract_sql() -> str:
    return (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) "
        "AS k FROM events"
    )


def orders_monthly(orders: DataFrame) -> DataFrame:
    """Date bucketing: revenue-cents per month per status."""
    return (
        orders.groupBy(
            # DATE, matching DuckDB's date_trunc('month', ...) return type
            F.date_trunc("month", F.col("o_orderdate").cast("timestamp"))
            .cast("date")
            .alias("month"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
    )


def orders_monthly_sql() -> str:
    return """
        SELECT date_trunc('month', o_orderdate) AS month, o_orderstatus,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM orders GROUP BY 1, 2
    """


def approx_distinct_parts(
    lineitem: DataFrame, rsd: float = 0.02, bound_factor: float = 5.0
) -> DataFrame:
    """Approximate distinct count (HLL) checked against the exact count:
    emits (exact_parts, within_bound) where within_bound asserts the sketch
    landed within ``bound_factor * rsd`` of the truth.  The raw sketch value
    is engine-specific (not SQL-oracle-able), but this contract IS: the
    oracle expects (exact count, true), so a drifting sketch fails the
    driver gate loudly."""
    approx = F.approx_count_distinct("l_partkey", rsd)
    exact = F.countDistinct("l_partkey")
    return lineitem.agg(
        exact.alias("exact_parts"),
        (
            F.abs(approx - exact)
            <= F.lit(bound_factor * rsd) * exact
        ).alias("within_bound"),
    )


def approx_distinct_parts_sql() -> str:
    return (
        "SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts, "
        "true AS within_bound FROM lineitem"
    )


def approx_quantiles_contract(
    lineitem: DataFrame, rel_err: float = 0.01, col: str = "l_extendedprice",
) -> DataFrame:
    """Quantile-sketch contract (the approx_distinct_parts pattern): one row
    (n_rows, q25_ok, q50_ok, q75_ok, q99_ok) asserting percentile_approx
    lands within ``rel_err`` of the exact percentile for each quantile.
    Exact values are never emitted — continuous-interpolation percentiles
    are not ULP-stable across engines — but the contract is: the oracle
    expects (count, true, true, true, true), so sketch drift fails loudly."""
    qs = [0.25, 0.5, 0.75, 0.99]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for q in qs:
        approx = F.percentile_approx(col, q)
        exact = F.percentile(col, q)
        aggs.append(
            (F.abs(approx - exact) <= F.lit(rel_err) * F.abs(exact)).alias(
                f"q{int(q * 100)}_ok"
            )
        )
    return lineitem.agg(*aggs)


def approx_quantiles_contract_sql() -> str:
    return (
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS q25_ok, "
        "true AS q50_ok, true AS q75_ok, true AS q99_ok FROM lineitem"
    )


def approx_sketch_contracts(lineitem: DataFrame) -> DataFrame:
    """Both sketch contracts (HLL distinct + quantile) as ONE single-row
    gate: cross join of two 1-row frames is a free BroadcastNestedLoopJoin.
    One driver slot instead of two (50-row driver cap, NOTES_r4.md); the
    individual contracts remain separately pytest-covered."""
    return approx_distinct_parts(lineitem).crossJoin(
        approx_quantiles_contract(lineitem)
    )


def approx_sketch_contracts_sql() -> str:
    return (
        "SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts, "
        "true AS within_bound, CAST(count(*) AS BIGINT) AS n_rows, "
        "true AS q25_ok, true AS q50_ok, true AS q75_ok, true AS q99_ok "
        "FROM lineitem"
    )
