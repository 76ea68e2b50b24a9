"""Source connectors (SURVEY §2.1 S1-S3).

The reference reads from a Postgres replica (every ``FROM`` clause in
``/root/reference/src/main.py:130-141`` and the ``sql/`` scripts) and
from a BOM-ed, quoted CSV golden set
(``/root/reference/src/benchmark.py:236-238``). Here:

- Parquet is the primary columnar source (testdata stand-in for the
  replica) — scans get predicate pushdown + column pruning for free.
- ``read_jdbc`` is the faithful Postgres connector, partitioned on a
  numeric key so a 1000-executor cluster reads in parallel slices
  instead of one fat cursor (the reference streams one single-threaded
  cursor; ``src/util.py:5-11``).
- ``read_csv_golden`` mirrors the benchmark CSV semantics: header,
  quoted fields, UTF-8 BOM (Spark's UTF-8 reader strips the BOM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv_golden(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """CSV with header + quoted fields (benchmark/default.csv shape)."""
    reader = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("encoding", "UTF-8")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON lines with an explicit schema (no inference at scale)."""
    return spark.read.schema(schema).json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 64,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC scan — the faithful replacement for the
    reference's single psycopg2 cursor. Requires the JDBC driver jar on
    the classpath; callers should wrap in try/except for environments
    without it (like this container)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1 << 31))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
