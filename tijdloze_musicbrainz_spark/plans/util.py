"""Shared helpers for query builders and their DuckDB oracles.

Cross-engine hash-stability rules (see plans.registry docstring):
floats rounded, timestamps as epoch BIGINT, arrays sorted+joined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def epoch(col: Column | str) -> Column:
    """Timestamp → epoch seconds (BIGINT), truncating — matches the
    DuckDB twin ``epoch_sql``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c).cast("long")


def epoch_sql(expr: str) -> str:
    return f"CAST(floor(epoch({expr})) AS BIGINT)"


def round2(col: Column) -> Column:
    return F.round(col, 2)
