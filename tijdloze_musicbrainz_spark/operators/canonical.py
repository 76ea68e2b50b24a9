"""Per-group canonical selection (SURVEY §2.4 A8/A9 — the core operator).

The reference's heart is a per-recording argmin over a lexicographic
sort key (``/root/reference/src/main.py:242`` with the key built at
``:50-73``), and the benchmark's re-rank is a thresholded argmax
(``src/benchmark.py:128-133``). Both are Python loops over in-memory
groups there; here they are window functions, so they scale with
shuffle partitions instead of one driver core.

Scale notes:
- ``row_number`` over ``Window.partitionBy(keys)`` is a single shuffle
  on the group keys; AQE splits skewed partitions (one hot artist).
- The ordering must be TOTAL (include a unique tiebreak column) or the
  pick is nondeterministic across runs/engines — the reference's
  ``min()`` inherits Python's stable iteration order, which we must
  reproduce explicitly (SURVEY risk register).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_group(
    df: DataFrame,
    group_by: Sequence[str | Column],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep exactly one row per group: the first under ``order_by``.

    ``order_by`` must be a total order within each group (pass a
    unique id as the last key) for deterministic results.
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def argmin_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Single-row-winner argmin as ONE aggregation:
    ``min_by(struct(payload), struct(order_by))``.

    Scale rationale vs the window form (``top1_per_group``): an
    aggregate gets map-side partial combine — every map task reduces
    its local rows to one candidate per group before the shuffle, so a
    hot group (one artist with 10^6 candidate rows) ships ~#tasks rows
    instead of 10^6 to a single window partition. AQE skew-join does
    NOT split window partitions, so at 100× data the window form
    serializes on the hot key while this form stays balanced.

    ``order_by`` must be ascending column names forming a total order
    within each group (include a unique id last). Returns df's columns
    (group keys first), one row per group.
    """
    payload_cols = [c for c in df.columns if c not in group_by]
    key = F.struct(*[F.col(c) for c in order_by])
    payload = F.struct(*[F.col(c) for c in payload_cols])
    return (
        df.groupBy(*group_by)
        .agg(F.min_by(payload, key).alias("__best"))
        .select(*group_by, *[F.col(f"__best.{c}").alias(c) for c in payload_cols])
    )


def argmax_with_threshold(
    df: DataFrame,
    group_by: Sequence[str | Column],
    relevance: Column,
    order_by: Sequence[Column],
    threshold_divisor: float = 10.0,
) -> DataFrame:
    """The benchmark re-rank (src/benchmark.py:128-133): within each
    group, keep rows with relevance >= max(relevance)/divisor, then
    take the first row under ``order_by`` (earliest year, tie-broken
    by highest relevance in the reference)."""
    w_max = Window.partitionBy(*group_by)
    ranked = df.withColumn("__max_rel", F.max(relevance).over(w_max)).filter(
        relevance >= F.col("__max_rel") / threshold_divisor
    )
    return top1_per_group(ranked, group_by, order_by).drop("__max_rel")
