from __future__ import annotations

import duckdb
import pytest

from distributed_spatial_index_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dsi-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with the sf0.001 tables registered as views, the
    same way the driver's oracle gate does."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def assert_same_rows(spark_df, ddb_rows, sort_cols=None):
    """Order-insensitive exact row-multiset equality (ResultCompare.java:11-41
    semantics); Counter-based so NULL-bearing rows need no ordering."""
    from collections import Counter

    a = Counter(tuple(r) for r in spark_df.collect())
    b = Counter(tuple(r) for r in ddb_rows)
    assert a == b, (
        f"row mismatch: spark={sum(a.values())} oracle={sum(b.values())}; "
        f"spark-only={list((a - b).keys())[:5]} "
        f"oracle-only={list((b - a).keys())[:5]}"
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running load/stress tests (run by default; deselect "
        "with -m 'not slow' for a quick pass)",
    )
