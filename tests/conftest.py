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
    """Order-insensitive exact row-set equality (ResultCompare.java:11-41
    semantics)."""
    a = [tuple(r) for r in spark_df.collect()]
    b = [tuple(r) for r in ddb_rows]
    assert sorted(a) == sorted(b), (
        f"row mismatch: spark={len(a)} oracle={len(b)}; "
        f"spark-only={sorted(set(a) - set(b))[:5]} "
        f"oracle-only={sorted(set(b) - set(a))[:5]}"
    )
