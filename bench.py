"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Metric (BASELINE.json): spatial-join + tile-assignment throughput in
docs/sec.  "value" is total wall seconds across the headline queries (driver
contract); docs/sec appears under "docs_per_sec".  Run with
SPARK_GRAFT_CPUS=8 and =32 on the same input to evidence the two-cluster-size
scaling rule (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

from distributed_spatial_index_spark.session import get_spark


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(
        app_name="dsi-bench", cores=cpus, shuffle_partitions=int(cpus)
    )

    from distributed_spatial_index_spark.operators.density import density_grid
    from distributed_spatial_index_spark.operators.range_join import point_range_join
    from distributed_spatial_index_spark.operators.tiles import assign_tiles
    from distributed_spatial_index_spark.sources import tables as src

    table = "lineitem"
    # Repartition the narrow id column before deriving: the testdata parquet
    # is a single row group, so without this every per-doc expression runs on
    # one core (at real scale files split naturally; see geo_points docstring).
    pts = src.geo_points(spark, sf_dir, table, parallelism=int(cpus) * 2)
    n_docs = pts.count()  # also warms the JVM / parquet footer cache

    timings: dict[str, float] = {}

    def timed(name, df):
        t0 = time.perf_counter()
        _materialize(df)
        timings[name] = round(time.perf_counter() - t0, 4)

    timed("range_join", point_range_join(pts, src.range_queries(spark, sf_dir, table)))
    timed("tile_assignment", assign_tiles(pts))
    timed("density_grid", density_grid(pts))

    total = round(sum(timings.values()), 4)
    # throughput over the join+tile core (the BASELINE.json metric)
    core = timings["range_join"] + timings["tile_assignment"]
    print(
        json.dumps(
            {
                "metric": "spatial_join_tile_assignment",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "docs_per_sec": round(n_docs / core, 1) if core > 0 else None,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
