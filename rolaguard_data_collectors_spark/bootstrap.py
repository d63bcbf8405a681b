"""Executor bootstrap: make this package importable on Spark workers.

Pandas UDFs are pickled by module reference, so executor Python
workers must be able to ``import rolaguard_data_collectors_spark``.
When the driver loaded us by file path (the driver harness does), the
workers' sys.path knows nothing about the repo — so we zip the package
once per session and ``addPyFile`` it, which distributes it to every
executor (including real clusters, where this is the only correct
mechanism — a shared CWD can't be assumed at 1000 executors).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_rolaguard_pkg_shipped"


def ensure_executor_pythonpath(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}-{id(sc)}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _FLAG, True)
