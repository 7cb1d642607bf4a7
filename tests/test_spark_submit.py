"""Ship-shape smoke test: the engine must run via `spark-submit --py-files
mmkg_rag_spark.zip` (north-rule packaging), with the package importable ONLY
from the zip — the exact cluster deployment, where executors materialize the
code from the shipped archive, not from a checked-out repo on every node.

The real failure mode this guards: pandas-UDF/mapInPandas closures reference
module-level functions by qualified name, so Python *workers* must be able to
import mmkg_rag_spark from the --py-files zip (PYTHONPATH injection), not
from the driver's cwd. Running from a bare tmpdir with only run.py copied in
removes every other import path.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_py_files_zip_runs_pipeline(tmp_path):
    pkg = os.path.join(REPO, "mmkg_rag_spark")
    zip_path = tmp_path / "mmkg_rag_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))

    # only the entry script leaves the repo; the package arrives via the zip
    shutil.copy(os.path.join(pkg, "run.py"), tmp_path / "run.py")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # no accidental repo leakage into workers
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            str(tmp_path / "run.py"),
            "--n-docs", "30",
            "--warehouse", str(tmp_path / "wh"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "nodes=" in out and "edges=" in out, out[-4000:]
    # the staged driver must have committed snapshots (resume substrate)
    assert os.path.exists(tmp_path / "wh")
