"""Bucketed tables — Spark's replacement for the reference's B-tree
indexes (``sql/2:17-18,45,53-54``).

Postgres used per-row index lookups on alias/FK columns; at Spark
scale the equivalents are (a) broadcast for small dims, (b) BUCKETED
tables for the big fact-fact joins: both sides hash-clustered into
the same number of buckets on the join key at WRITE time, so the join
at READ time needs no shuffle at all — the 100 TB co-location lever.

Bucket-count sizing at scale: pick buckets so one bucket of the
larger table is ~128-256 MB compressed (e.g. 600 GB lineitem → ~4096
buckets). Both join sides must share the bucket count (or one must
be a multiple — Spark 3.1+ bucket coalescing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    location: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-bucketed) table.
    Sorting within buckets additionally enables sort-merge joins
    without a per-task sort.

    ``location`` makes the table EXTERNAL at an explicit path —
    callers that must run inside a foreign SparkSession (the round
    driver's) pass one so the write never depends on that session's
    ``spark.sql.warehouse.dir`` (which defaults to the process cwd).

    Drops any stale table AND its leftover directory first: a table
    location can outlive the per-process metastore entry, and
    saveAsTable refuses to reuse an orphaned location."""
    import shutil  # noqa: PLC0415

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if location is not None:
        stale = location
    else:
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:") :]
        stale = f"{warehouse}/{table.lower()}" if warehouse.startswith("/") else None
    if stale:
        shutil.rmtree(stale, ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if location is not None:
        writer = writer.option("path", location)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table_a: str, table_b: str) -> bool:
    """True when both tables are bucketed (callers can assert the
    no-shuffle property before relying on it)."""

    def desc(tbl: str) -> str:
        return "\n".join(
            r["data_type"] or ""
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
            if r["col_name"] in ("Num Buckets", "Bucket Columns")
        )

    return bool(desc(table_a)) and bool(desc(table_b))
