"""Skew mitigation for joins whose build side is too big to
broadcast and whose probe side has hot keys (the Beatles problem:
a handful of artists own a disproportionate share of candidate rows).

AQE's skew-join splitting (enabled in session.py) handles most cases
at runtime; explicit salting remains the tool when (a) AQE cannot
split (e.g. the skew is inside a window/group rather than a join) or
(b) you want deterministic layout. Pattern:

- probe (big, skewed) side: add ``salt = hash(row) % n`` — any
  deterministic per-row value works, the join key becomes
  (key, salt) so one hot key spreads over n tasks;
- build side: replicate each row n times, one per salt value.

Shuffle math: build side grows n-fold, hot-key task shrinks n-fold.
Pick n ≈ (hot-key rows) / (target rows per task); n=8-32 covers most
real skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: tuple[str, str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe.on[0] == build.on[1]`` with an ``n_salts``-way
    salt folded into the key. Result columns = probe ∪ build columns
    (salt dropped). Deterministic: the salt is a hash of the probe
    row, not a random draw (reproducible under task retries)."""
    pk, bk = on
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts)
    ).cast("int")
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    # resolve keys through the DataFrames: unqualified F.col(pk) is
    # ambiguous when probe and build share the key column name (the
    # common equi-join case)
    joined = p.join(
        b, (p[pk] == b[bk]) & (p["__salt"] == b["__salt"]), how
    )
    return joined.drop("__salt")
