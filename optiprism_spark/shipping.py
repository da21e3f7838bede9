"""Ship the optiprism_spark package to Python workers.

``applyInPandas`` kernels close over package classes (dsl dataclasses
etc.); cloudpickle serializes those by module reference, so executor
Python workers must be able to import the package. On a real cluster
(and in local mode when the driver's cwd is elsewhere) that is not a
given — ``ensure_shipped`` zips the package once per session and
registers it with ``SparkContext.addPyFile``, the standard Spark
mechanism for shipping Python dependencies.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_optiprism_spark_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"optiprism_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "optiprism_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
