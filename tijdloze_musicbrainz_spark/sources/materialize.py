"""Materialized derived tables — the reference's core architecture:
normalize/score ONCE at write time (``sql/4:32``, ``sql/5:34``:
pre-normalized alias columns), query the materialization cheaply at
read time. The interactive read path never recomputes the catalog.

``materialized`` is a build-once parquet cache keyed by
(sf_dir, name): first call builds and writes, later calls read the
parquet directly — so a registered read-path query measures what the
reference's benchmark measures (query against export tables), not
catalog construction. Delete the directory to invalidate.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

MAT_ROOT = os.environ.get("SPARK_GRAFT_MAT_DIR", "/tmp/spark_graft_materialized")


def _mat_path(sf_dir: str, name: str) -> str:
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    return f"{MAT_ROOT}/{tag}/{name}"


def materialized(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the materialized table, building it on first use. The
    _SUCCESS marker gates readiness (a half-written dir from a killed
    job rebuilds)."""
    path = _mat_path(sf_dir, name)
    if not os.path.exists(f"{path}/_SUCCESS"):
        build().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
