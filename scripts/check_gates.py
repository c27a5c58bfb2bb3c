"""Targeted replica of the driver's oracle gate (see
.claude/skills/verify/SKILL.md): run the named queries() entries against
their oracle_sql() twins at sf0.01 (or $SPARK_GRAFT_SF_DIR).

    python scripts/check_gates.py knn ivf_topk        # subset
    python scripts/check_gates.py                     # all
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from distributed_spatial_index_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = e.oracle_sql()
    queries = e.queries()
    names = sys.argv[1:] or list(queries)
    key = lambda t: tuple((v is None, str(type(v)), str(v)) for v in t)  # noqa: E731
    bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf)
            cols = sorted(sdf.columns)
            a = sorted((tuple(r[c] for c in cols) for r in sdf.collect()), key=key)
            if name not in oracles:
                print(f"{name}: rows-only {len(a)}  [{time.perf_counter()-t0:.1f}s]")
                continue
            res = con.execute(oracles[name])
            onames = [d[0] for d in res.description]
            idx = [onames.index(c) for c in cols]
            b = sorted((tuple(r[i] for i in idx) for r in res.fetchall()), key=key)
            ok = a == b
            bad += not ok
            print(f"{name}: rows {len(a)}/{len(b)} "
                  f"{'MATCH' if ok else 'MISMATCH'}  [{time.perf_counter()-t0:.1f}s]")
            if not ok:
                only_a = [r for r in a if r not in b][:3]
                only_b = [r for r in b if r not in a][:3]
                print("  spark-only:", only_a)
                print("  oracle-only:", only_b)
        except Exception as ex:  # noqa: BLE001
            bad += 1
            print(f"{name}: ERR {type(ex).__name__}: {str(ex)[:300]}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
