"""Ship-path test: the engine runs under ``spark-submit --py-files pkg.zip``.

The north-rule deployment contract is "ships via spark-submit --py-files on a
multi-executor cluster". This test builds the package zip exactly as a user
would, then launches a REAL spark-submit subprocess whose working directory
does NOT contain the repo (so the only way the job can import
``em_connected_components_spark`` is through the ``--py-files`` archive —
the same distribution channel executors use on a cluster), runs exact CC on a
known two-component graph inside that job, and checks the result through the
subprocess boundary.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "em_connected_components_spark"

JOB = """
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("emccs-submit-e2e")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from em_connected_components_spark.plans.connected_components import (
    connected_components,
)

# two components: {0,1,2,3} path and {10,11,12} triangle
edges = spark.createDataFrame(
    [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (12, 10)],
    schema="src long, dst long",
)
labels = connected_components(edges, jump_local_threshold=10**6)
rows = sorted((r["node"], r["comp"]) for r in labels.collect())
expect = [(0, 0), (1, 0), (2, 0), (3, 0), (10, 10), (11, 10), (12, 10)]
assert rows == expect, rows
print("SUBMIT_E2E_OK", len(rows))
spark.stop()
"""


def build_pkg_zip(out_path: str) -> str:
    """Zip the package the way a deploy script would (no tests, no caches)."""
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return out_path


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_e2e(tmp_path):
    pkg_zip = build_pkg_zip(str(tmp_path / f"{PKG}.zip"))
    job_py = tmp_path / "job.py"
    job_py.write_text(JOB)

    env = dict(os.environ)
    # the job must resolve the package from --py-files, not from the repo
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            shutil.which("spark-submit"),
            "--master", "local[2]",
            "--py-files", pkg_zip,
            str(job_py),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SUBMIT_E2E_OK 7" in proc.stdout, (
        proc.stdout[-2000:] + proc.stderr[-2000:]
    )
