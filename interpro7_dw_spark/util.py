"""Runtime utilities."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_shipped_apps: set[str] = set()


def ensure_pyfiles(spark: SparkSession) -> None:
    """Ship this package to Python workers (addPyFile zip), once per
    application.

    Needed because operators with Python kernels (pandas_udf /
    mapInPandas / applyInPandasWithState) reference helpers from this
    package, and cloudpickle serializes module-level functions BY
    REFERENCE — a worker whose interpreter can't import
    ``interpro7_dw_spark`` (driver launched from another cwd, package
    not installed) would fail. Equivalent to ``spark-submit
    --py-files`` on a cluster.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _shipped_apps:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), f"i7dw_spark_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _shipped_apps.add(app_id)
