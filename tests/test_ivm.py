"""Incremental view maintenance edge semantics the sf tables don't
exercise: a group emptied by deletes must DROP OUT of the maintained
view (as a recompute would drop it) and a group born entirely from
the delta must appear."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ivm(view, delta):
    merged = (
        view.join(delta, "g", "full")
        .select(
            "g",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (
                F.coalesce(F.col("s"), F.lit(0).cast("decimal(25,6)"))
                + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(25,6)"))
            ).alias("s"),
        )
        .filter(F.col("n") > 0)
    )
    return {r.g: (r.n, float(r.s)) for r in merged.collect()}


def test_ivm_drops_emptied_and_births_new_groups(spark):
    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0)], ["g", "v"]
    )
    view = base.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(25,6)")).alias("s"),
    )
    # delete BOTH 'a' rows, insert a brand-new group 'c'
    delta_rows = spark.createDataFrame(
        [("a", 10.0, -1), ("a", 20.0, -1), ("c", 7.0, 1)],
        ["g", "v", "sign"],
    )
    delta = delta_rows.groupBy("g").agg(
        F.sum("sign").alias("dn"),
        F.sum(F.col("v").cast("decimal(25,6)") * F.col("sign")).alias("ds"),
    )
    got = _ivm(view, delta)
    assert got == {"b": (1, 5.0), "c": (1, 7.0)}


def test_ivm_matches_recompute_under_random_deltas(spark):
    import random

    rng = random.Random(8)
    base_rows = [(f"g{rng.randrange(5)}", round(rng.uniform(1, 100), 2)) for _ in range(200)]
    ins_rows = [(f"g{rng.randrange(7)}", round(rng.uniform(1, 100), 2)) for _ in range(50)]
    del_rows = rng.sample(base_rows, 60)

    base = spark.createDataFrame(base_rows, ["g", "v"])
    view = base.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(25,6)")).alias("s"),
    )
    delta_rows = spark.createDataFrame(
        [(g, v, 1) for g, v in ins_rows] + [(g, v, -1) for g, v in del_rows],
        ["g", "v", "sign"],
    )
    delta = delta_rows.groupBy("g").agg(
        F.sum("sign").alias("dn"),
        F.sum(F.col("v").cast("decimal(25,6)") * F.col("sign")).alias("ds"),
    )
    got = _ivm(view, delta)

    # recompute from scratch: base multiset minus deletes plus inserts
    remaining = list(base_rows)
    for d in del_rows:
        remaining.remove(d)
    remaining += ins_rows
    from collections import defaultdict
    from decimal import Decimal

    want_n: dict = defaultdict(int)
    want_s: dict = defaultdict(lambda: Decimal(0))
    for g, v in remaining:
        want_n[g] += 1
        want_s[g] += Decimal(str(v))
    want = {g: (n, float(want_s[g])) for g, n in want_n.items() if n > 0}
    assert {g: n for g, (n, _) in got.items()} == {g: n for g, (n, _) in want.items()}
    for g in want:
        assert abs(got[g][1] - want[g][1]) < 1e-6, g
