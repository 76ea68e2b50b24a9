"""The co-location story, asserted on the physical plan: a fact-fact
join between two tables bucketed on the join key must contain ZERO
shuffle exchanges — this is what replaces the reference's B-tree
indexes at cluster scale."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from tijdloze_musicbrainz_spark.sources.bucketing import (
    bucketed_join_ready,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8)
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    assert bucketed_join_ready(spark, "b_lineitem", "b_orders")

    a = spark.table("b_lineitem")
    b = spark.table("b_orders")
    joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy("o_orderstatus").agg(
        F.count("*").alias("n")
    )
    plan = _plan(joined)
    # join itself must be shuffle-free: bucket layout co-locates keys.
    # (the final single-group aggregate may still exchange)
    join_part = plan.split("HashAggregate")[0]
    assert "Exchange" not in join_part, join_part

    # and it still computes the right thing
    expect = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_registered_bucketed_query_is_fully_shuffle_free(spark, sf_dir):
    """The REGISTERED query (round-3 verdict #7): join AND groupBy both
    run on the bucket key, so the ENTIRE plan — not just the join —
    must contain zero shuffle exchanges (BroadcastExchange is ruled
    out too via the merge hint)."""
    import re

    from tijdloze_musicbrainz_spark.plans import REGISTRY

    df = REGISTRY["s4_bucketed_join_roundtrip"].builder(spark, sf_dir)
    plan = _plan(df)
    shuffles = re.findall(r"\(\d+\) Exchange", plan)
    assert not shuffles, plan


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    # control: the same join on plain parquet MUST shuffle — proves
    # the assertion above is measuring the bucketing, not AQE luck.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert "Exchange" in _plan(joined)
