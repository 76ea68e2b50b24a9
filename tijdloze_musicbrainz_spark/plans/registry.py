"""The query registry — the engine's public operator inventory.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) registers here as a ``QuerySpec``: a Spark DataFrame
builder and, when the semantics are SQL-expressible, the equivalent
ANSI SQL that DuckDB runs over the same parquet as a differential
oracle. This registry IS the driver contract surface
(``__spark_entry__.queries()`` / ``oracle_sql()``).

Conventions (driver compare is column-name + value-hash based):
- every computed column is aliased identically in builder and oracle;
- float aggregates are ``round(x, 2)`` on BOTH sides (double sums
  differ in the last ulps between engines; rounding makes the hash
  stable);
- timestamp outputs are emitted as epoch seconds (BIGINT) — identical
  across Spark (session TZ = UTC) and DuckDB (UTC-naive);
- array outputs are sorted and joined to one string (engines disagree
  on array hashing and ordering inside groups).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    survey_ids: tuple[str, ...]  # SURVEY.md §2 operator ids covered
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    survey_ids: tuple[str, ...],
    oracle: str | None = None,
    doc: str = "",
) -> Callable[[Builder], Builder]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, survey_ids, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def queries_map() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
