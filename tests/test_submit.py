"""The north rule's launch mechanism, executed: `spark-submit --py-files
engine.zip jobs/run_pipeline.py` must run the full pipeline with the
package imported FROM THE ZIP (the test's working directory contains
only the job file and the zip, so there is no other import source) —
the packaging story is a passing subprocess, not prose."""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "distributed_spatial_index_spark"


def _build_zip(target: str) -> None:
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(REPO, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in filenames:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, REPO))


@pytest.mark.slow
def test_spark_submit_py_files_runs_pipeline():
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    with tempfile.TemporaryDirectory() as d:
        _build_zip(f"{d}/engine.zip")
        shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), d)
        proc = subprocess.run(
            [
                spark_submit, "--master", "local[4]",
                "--py-files", "engine.zip", "run_pipeline.py",
                "--data", "/root/testdata/sf0.001", "--out", f"{d}/out",
            ],
            cwd=d,  # no repo on sys.path: the package must come from the zip
            capture_output=True,
            text=True,
            timeout=540,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        # the pipeline landed its committed outputs
        out_dirs = set(os.listdir(f"{d}/out"))
        assert {"steps", "metrics", "lineage"} <= out_dirs, out_dirs
        # and the metrics table is a readable parquet with pipeline rows
        import duckdb

        n = duckdb.sql(
            f"SELECT count(*) FROM '{d}/out/metrics/*.parquet' "
            "WHERE step = 'range_join'"
        ).fetchone()[0]
        assert n > 0
