"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``tijdloze_musicbrainz_spark``; the registry
(``tijdloze_musicbrainz_spark.plans.REGISTRY``) is the single source
of truth for the operator inventory.
"""

from __future__ import annotations

import os as _os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Python WORKERS resolve imports from the environment PYTHONPATH the
# JVM inherits — not from the driver's sys.path. Export the repo root
# at import time (before any SparkSession exists) so mapInPandas /
# Python-datasource closures that reference this package unpickle on
# workers even when the consuming process started from a foreign cwd.
# On a real cluster the same contract is `spark-submit --py-files`.
# DELIBERATE duplicate of session.export_worker_pythonpath: this
# module must not import the package at module scope (a package-level
# error would zero the whole driver contract — the round-1 failure
# class). Keep the two in sync.
_REPO_ROOT = _os.path.dirname(_os.path.abspath(__file__))
if _REPO_ROOT not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _REPO_ROOT + _os.pathsep + _os.environ["PYTHONPATH"]
        if _os.environ.get("PYTHONPATH")
        else _REPO_ROOT
    )

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-part canonical order selection: multi-join -> group-min ->
    lexicographic sort-key -> window top-1 (the reference's core
    algorithm, /root/reference/src/main.py:242, re-expressed as one
    declarative Spark plan).
    """
    from tijdloze_musicbrainz_spark.plans.relational import (  # noqa: PLC0415
        flagship_canonical_order,
    )

    return flagship_canonical_order(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tijdloze_musicbrainz_spark.plans import queries_map  # noqa: PLC0415

    return queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible
    ops → driver records a weaker rows-only check)."""
    from tijdloze_musicbrainz_spark.plans import oracle_sql_map  # noqa: PLC0415

    return oracle_sql_map()
