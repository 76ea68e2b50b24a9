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


def _source_fingerprint(sf_dir: str) -> str:
    """Short content fingerprint of the source tables: (name, mtime_ns,
    size) of every parquet under sf_dir. Regenerated testdata at the
    same path gets a NEW cache directory instead of silently serving
    stale materializations (round-2 ADVICE)."""
    import hashlib  # noqa: PLC0415

    h = hashlib.sha256()
    try:
        for fname in sorted(os.listdir(sf_dir)):
            if fname.endswith(".parquet"):
                st = os.stat(os.path.join(sf_dir, fname))
                h.update(f"{fname}:{st.st_mtime_ns}:{st.st_size};".encode())
    except OSError:
        h.update(b"unreadable")
    return h.hexdigest()[:12]


def _mat_path(sf_dir: str, name: str) -> str:
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    return f"{MAT_ROOT}/{tag}-{_source_fingerprint(sf_dir)}/{name}"


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
