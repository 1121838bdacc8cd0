"""Ship the package to executors — the ``--py-files`` story.

The north rule requires the pipeline to run via ``spark-submit
--py-files seq2kg_spark.zip``.  For programmatic sessions (tests, bench,
driver harness) ``ship_package`` builds the same zip once per process and
registers it with ``SparkContext.addPyFile``, so executor Python workers can
unpickle our UDF closures regardless of where the driver was launched from.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_zip_path: str | None = None


def build_package_zip() -> str:
    """Zip seq2kg_spark/ into a temp file (cached per process)."""
    global _zip_path
    if _zip_path and os.path.exists(_zip_path):
        return _zip_path
    fd, path = tempfile.mkstemp(prefix="seq2kg_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "seq2kg_spark", os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    _zip_path = path
    return path


_shipped: set[str] = set()


def ship_package(spark) -> None:
    """Register the package zip with the session's SparkContext.

    Idempotent per application — safe to call from every operator that
    closes over package code (the driver harness may hand us a session we
    didn't build).
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _shipped:
        return
    spark.sparkContext.addPyFile(build_package_zip())
    _shipped.add(app_id)
