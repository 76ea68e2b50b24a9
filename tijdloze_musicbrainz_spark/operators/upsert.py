"""Idempotent sinks (SURVEY §2.1 S7/S8, §2.4 A10).

The reference re-runs per artist and relies on Postgres upserts:
``ON CONFLICT (id) DO UPDATE`` overwrites all non-key columns
(``/root/reference/src/main.py:298-304,314-323``) and
``ON CONFLICT DO NOTHING`` keeps the first writer
(``sql/1:20``, ``sql/4:34``, ``sql/5:36``). Parquet has no upsert, so
the Spark-native equivalents are set-oriented dedup-before-write:

- last-writer-wins  → window top-1 over an explicit priority order,
  then a full (or partition-wise) atomic overwrite;
- first-writer-wins → ``dropDuplicates`` after a deterministic order
  (or the same window with the order flipped).

On a real lakehouse table (Delta/Iceberg) the incremental equivalent
is ``MERGE INTO``; those jars are not in this image, so the writers
below gate on availability and fall back to overwrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .canonical import top1_per_group


def dedup_last_wins(
    df: DataFrame, keys: Sequence[str], priority: Sequence[Column]
) -> DataFrame:
    """One row per key; highest write-priority wins (S7 semantics).

    ``priority`` orders rows within a key, FIRST row wins — pass e.g.
    ``[F.desc("updated_at"), F.desc("batch_id")]`` for last-writer.
    """
    return top1_per_group(df, list(keys), list(priority))


def dedup_first_wins(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """One row per key; first writer under ``order`` wins (S8)."""
    return top1_per_group(df, list(keys), list(order))


def write_upsert(
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    priority: Sequence[Column],
    partition_by: Sequence[str] = (),
) -> None:
    """Dedup-then-atomic-overwrite parquet sink (full rewrite — for
    when the batch IS the whole table). For incremental merges into an
    existing large target use ``merge_upsert_bucketed`` below, which
    touches only the key-hash buckets the batch hits."""
    deduped = dedup_last_wins(df, keys, priority)
    writer = deduped.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by).option(
            "partitionOverwriteMode", "dynamic"
        )
    writer.parquet(path)


N_MERGE_BUCKETS = 16


def merge_upsert_bucketed(
    batch_df: DataFrame,
    path: str,
    keys: Sequence[str],
    priority_col: str,
    n_buckets: int = N_MERGE_BUCKETS,
) -> list[int]:
    """Incremental MERGE into a key-hash-bucketed parquet target — the
    engine's stand-in for the reference's per-artist ``ON CONFLICT DO
    UPDATE`` re-run (src/main.py:298-323) and for Delta/Iceberg
    ``MERGE INTO`` (those jars are not in this image).

    Target layout: ``__bucket=<pmod(xxhash64(keys), N)>`` partition
    directories. A batch (1) computes its rows' buckets, (2) reads
    back ONLY the touched bucket partitions (partition pruning on the
    ``__bucket`` filter), (3) last-writer-wins-dedups
    batch ∪ touched-existing rows, and (4) swaps in only the touched
    bucket directories. Work per merge is O(|touched buckets|), not
    O(|target|) — a one-artist re-run on a 100 TB table touches one
    bucket.

    Atomicity: each bucket swap is a per-directory rmtree+rename, so a
    concurrent reader can observe one bucket mid-swap; on a real
    lakehouse table the same layout maps onto dynamic partition
    overwrite or a transactional MERGE. For the ATOMIC multi-bucket
    variant (single pointer-swap commit, snapshot isolation, time
    travel) use ``operators.manifest.merge_upsert_manifest`` (r5).

    Returns the sorted touched bucket ids (tests/observability)."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    spark = batch_df.sparkSession
    bucket = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)
    ).cast("int")
    batch = batch_df.withColumn("__bucket", bucket)
    # bounded collect: at most n_buckets distinct values
    touched = sorted(
        r["__bucket"] for r in batch.select("__bucket").distinct().collect()
    )
    if not touched:
        return []
    if os.path.exists(path):
        existing = spark.read.parquet(path).filter(
            F.col("__bucket").isin([int(b) for b in touched])
        )
        merged = existing.unionByName(batch, allowMissingColumns=False)
    else:
        merged = batch
    out = dedup_last_wins(merged, list(keys), [F.desc(priority_col)])
    tmp = f"{path}__tmp"
    out.write.mode("overwrite").partitionBy("__bucket").parquet(tmp)
    os.makedirs(path, exist_ok=True)
    for b in touched:
        src = os.path.join(tmp, f"__bucket={b}")
        dst = os.path.join(path, f"__bucket={b}")
        if os.path.exists(src):
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return touched


def accuracy_report(
    df: DataFrame, expected: Column, actual: Column
) -> DataFrame:
    """The benchmark accuracy fold (src/benchmark.py:245-274):
    total / missing (no match) / wrong (mismatched id) / correct,
    with percentages — as one aggregation, not a driver loop."""
    flags = df.select(
        F.when(actual.isNull(), 1).otherwise(0).alias("__missing"),
        F.when(actual.isNotNull() & (actual != expected), 1).otherwise(0).alias("__wrong"),
        F.when(actual.isNotNull() & (actual == expected), 1).otherwise(0).alias("__correct"),
    )
    agg = flags.agg(
        F.count("*").alias("total"),
        F.sum("__missing").alias("missing"),
        F.sum("__wrong").alias("wrong"),
        F.sum("__correct").alias("correct"),
    )
    return agg.select(
        "total",
        "missing",
        "wrong",
        "correct",
        F.round(F.col("missing") * 100.0 / F.col("total"), 2).alias("missing_pct"),
        F.round(F.col("wrong") * 100.0 / F.col("total"), 2).alias("wrong_pct"),
        F.round(F.col("correct") * 100.0 / F.col("total"), 2).alias("correct_pct"),
    )
