"""Relational-surface ops vs DuckDB oracles."""

from __future__ import annotations

import pytest

from distributed_spatial_index_spark.operators import relational as rel
from distributed_spatial_index_spark.sources import tables as src
from tests.conftest import SF_DIR, assert_same_rows


def test_pricing_rollup(spark, ddb):
    got = rel.pricing_rollup(src.load(spark, SF_DIR, "lineitem"))
    assert_same_rows(got, ddb.execute(rel.pricing_rollup_sql()).fetchall())
    # rollup must include the grand-total row
    assert got.filter("l_returnflag IS NULL AND l_linestatus IS NULL").count() == 1


def test_semi_anti_joins(spark, ddb):
    c = src.load(spark, SF_DIR, "customer")
    o = src.load(spark, SF_DIR, "orders")
    got_s = rel.customers_with_orders(c, o)
    got_a = rel.customers_without_orders(c, o)
    assert_same_rows(got_s, ddb.execute(rel.customers_with_orders_sql()).fetchall())
    assert_same_rows(got_a, ddb.execute(rel.customers_without_orders_sql()).fetchall())
    assert got_s.count() + got_a.count() == c.count()


def test_events_json_extract(spark, ddb):
    got = rel.events_json_extract(src.load(spark, SF_DIR, "events"))
    assert_same_rows(got, ddb.execute(rel.events_json_extract_sql()).fetchall())


def test_orders_monthly(spark, ddb):
    got = rel.orders_monthly(src.load(spark, SF_DIR, "orders"))
    assert_same_rows(got, ddb.execute(rel.orders_monthly_sql()).fetchall())


def test_approx_distinct_error_bound(spark):
    row = rel.approx_distinct_parts(src.load(spark, SF_DIR, "lineitem")).collect()[0]
    assert row["exact_parts"] > 0
    assert row["within_bound"] is True

def test_approx_quantiles_contract(spark, ddb):
    got = rel.approx_quantiles_contract(src.load(spark, SF_DIR, "lineitem"))
    assert_same_rows(
        got, ddb.execute(rel.approx_quantiles_contract_sql()).fetchall()
    )
    row = got.collect()[0]
    assert row["q25_ok"] and row["q50_ok"] and row["q75_ok"] and row["q99_ok"]
