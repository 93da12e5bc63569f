"""Executor-worker import independence: the driver harness may import
this repo via sys.path manipulation from an arbitrary cwd, WITHOUT
installing the package or setting PYTHONPATH. Python workers then cannot
import cve_manager_spark — so nothing pickled to executors (pandas UDFs,
mapInPandas/applyInPandas functions, foreachPartition closures) may
reference a module-level object from this package. Nested defs are
pickled by value and are safe.

This test runs every registry query that executes Python on workers in a
subprocess configured exactly like that hostile driver (caught a real
regression: decode_resize referencing module-level decode_stub).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[2]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e

q = e.queries()
# every query whose plan runs Python on executor workers
names = [
    "multimodal_features", "multimodal_thumbnail", "multimodal_frames",
    "dedup_embedding", "knn_cosine_pandas", "grouped_median_pandas",
]
for name in names:
    n = q[name](spark, "/root/testdata/sf0.001").count()
    print(f"{name}: {n}", flush=True)
print("WORKER_IMPORTS_OK")
"""


def test_worker_side_queries_run_without_package_on_path(tmp_path):
    script = tmp_path / "hostile_driver.py"
    script.write_text(_SCRIPT.replace("@REPO@", REPO))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "WORKER_IMPORTS_OK" in proc.stdout
