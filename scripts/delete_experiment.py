"""Measure the copy-on-write delete (and MERGE/upsert) against the
full-rewrite alternative at sf0.1 (BENCH/BASELINE.md "Copy-on-write
delete" section).

Each mode runs in its OWN python session (host-noise protocol: neither
op inherits the other's caches or JVM warmth):

  python scripts/delete_experiment.py land    # build + manifest layout
  python scripts/delete_experiment.py delete  # COW delete (mutates!)
  python scripts/delete_experiment.py full    # filter + full re-land
  python scripts/delete_experiment.py upsert  # COW merge (mutates!)
  python scripts/delete_experiment.py full_upsert  # merge as full re-land

The upsert batch mirrors the nightly-recrawl shape: 2,000 existing ids
from the busiest pcell re-geocoded (+3.0 x), plus 1,000 brand-new ids.

The predicate is (pcell == <busiest>) & (id % 2 == 0): a partial-file
spatial delete touching one hive directory of 16.  `delete` re-attaches
the landed table from its _spec (separate-session serving is the attach
contract) and times ONLY the delete call; `full` times what a user
without the delete verb would run — read the layout, filter, re-land +
re-manifest at a new path.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/del_bench"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from distributed_spatial_index_spark.session import get_spark

    return get_spark(app_name="delete-exp", cores=32, shuffle_partitions=32)


def main(mode: str) -> None:
    from pyspark.sql import functions as F

    from distributed_spatial_index_spark.plans.bucketing import (
        attach_bucketed_table,
        write_bucketed_manifest,
        write_bucketed_points,
    )
    from distributed_spatial_index_spark.sources import tables as src

    spark = _spark()
    print("load_pre:", os.getloadavg())
    if mode == "land":
        shutil.rmtree(BASE, ignore_errors=True)
        pts = src.unique_geo_points(spark, SF_DIR, "lineitem", parallelism=32)
        # SPARK_GRAFT_EXP_FANOUT=k replicates the table k-fold (distinct
        # ids, same geometry) so the delete-vs-rewrite asymmetry is
        # measured ACROSS scales, not assumed: the affected-pcell file
        # bytes grow k-fold but stay 1/16th of the table, while the full
        # rewrite's scan+shuffle grows k-fold outright.
        k = int(os.environ.get("SPARK_GRAFT_EXP_FANOUT", "1"))
        if k > 1:
            base = pts
            off = 10_000_000_000
            for i in range(1, k):
                pts = pts.unionByName(
                    base.withColumn("id", F.col("id") + F.lit(i * off))
                )
        t0 = time.perf_counter()
        write_bucketed_points(
            pts, "t_exp_pts", f"{BASE}/pts", n_buckets=8, coarse_bits=2
        )
        write_bucketed_manifest(spark, "t_exp_pts")
        print(f"land_sec: {time.perf_counter() - t0:.2f}")
        print("rows:", spark.table("t_exp_pts").count())
    elif mode == "delete":
        from distributed_spatial_index_spark.plans.delete import (
            delete_from_bucketed_table,
        )

        attach_bucketed_table(spark, "t_exp_pts", f"{BASE}/pts")
        pc = spark.table("t_exp_pts").groupBy("pcell").count().orderBy(
            F.desc("count")
        ).first()["pcell"]
        pred = (F.col("pcell") == pc) & (F.col("id") % 2 == 0)
        t0 = time.perf_counter()
        stats = delete_from_bucketed_table(spark, "t_exp_pts", pred)
        print(f"delete_sec: {time.perf_counter() - t0:.2f}")
        print("stats:", stats)
    elif mode == "full":
        attach_bucketed_table(spark, "t_exp_pts", f"{BASE}/pts")
        pc = spark.table("t_exp_pts").groupBy("pcell").count().orderBy(
            F.desc("count")
        ).first()["pcell"]
        shutil.rmtree(f"{BASE}/pts_v2", ignore_errors=True)
        src_df = spark.read.option("basePath", f"{BASE}/pts").parquet(
            f"{BASE}/pts"
        )
        pred = (F.col("pcell") == pc) & (F.col("id") % 2 == 0)
        t0 = time.perf_counter()
        write_bucketed_points(
            src_df.filter(~F.coalesce(pred, F.lit(False)))
            .select("id", "x", "y", "ts"),
            "t_exp_pts_v2", f"{BASE}/pts_v2", n_buckets=8, coarse_bits=2,
        )
        write_bucketed_manifest(spark, "t_exp_pts_v2")
        print(f"full_rewrite_sec: {time.perf_counter() - t0:.2f}")
        print("rows:", spark.table("t_exp_pts_v2").count())
    elif mode in ("upsert", "full_upsert"):
        attach_bucketed_table(spark, "t_exp_pts", f"{BASE}/pts")
        tbl = spark.table("t_exp_pts")
        pc = tbl.groupBy("pcell").count().orderBy(
            F.desc("count")
        ).first()["pcell"]
        cols = ["id", "x", "y", "ts"]
        upd = (
            tbl.filter(F.col("pcell") == pc)
            .orderBy("id").limit(2000)
            .withColumn("x", F.col("x") + F.lit(3.0))
            .select(*cols)
        )
        max_id = tbl.agg(F.max("id")).collect()[0][0]
        ins = (
            tbl.orderBy(F.desc("id")).limit(1000)
            .withColumn("id", F.col("id") + F.lit(int(max_id)))
            .select(*cols)
        )
        batch = upd.unionByName(ins).localCheckpoint()
        if mode == "upsert":
            from distributed_spatial_index_spark.plans.upsert import (
                upsert_into_bucketed_table,
            )

            t0 = time.perf_counter()
            stats = upsert_into_bucketed_table(spark, "t_exp_pts", batch)
            print(f"upsert_sec: {time.perf_counter() - t0:.2f}")
            print("stats:", stats)
        else:
            # what a user without the merge verb runs: anti-join the
            # batch keys out of the whole table, union the batch,
            # re-land + re-manifest at a new path
            shutil.rmtree(f"{BASE}/pts_v2", ignore_errors=True)
            src_df = spark.read.option("basePath", f"{BASE}/pts").parquet(
                f"{BASE}/pts"
            )
            t0 = time.perf_counter()
            merged = (
                src_df.join(batch.select("id"), "id", "left_anti")
                .select(*cols)
                .unionByName(batch.select(*cols))
            )
            write_bucketed_points(
                merged, "t_exp_pts_v2", f"{BASE}/pts_v2",
                n_buckets=8, coarse_bits=2,
            )
            write_bucketed_manifest(spark, "t_exp_pts_v2")
            print(f"full_upsert_sec: {time.perf_counter() - t0:.2f}")
            print("rows:", spark.table("t_exp_pts_v2").count())
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    print("load_post:", os.getloadavg())
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
