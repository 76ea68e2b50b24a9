"""Scale-mechanism queries: the skew-mitigation and co-location
operators from SURVEY §4 exercised as REGISTERED, oracle-checked
queries (round-3 verdict #6/#7 — previously these lived only in unit
tests, so the skew/bucketing claims had no CORRECTNESS row).

- ``j_skew_salted_join`` runs ``operators.skew.salted_join`` on a
  deliberately hot key (half of lineitem collapses onto one part) and
  is checked against the PLAIN join's SQL — salting must be invisible
  in the result.
- ``s4_bucketed_join_roundtrip`` writes two bucketed tables
  (the reference's B-tree-index replacement, sql/2:17-18,45,53-54),
  reads them back and joins + aggregates entirely shuffle-free;
  ``tests/test_bucketing.py`` plan-lints this registered query for
  zero shuffle exchanges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import money_sum, money_sum_sql, t

N_SALTS = 8
N_BUCKETS = 8

# Probe-side hot key: every even partkey collapses onto part 1 — at
# sf0.1 that is ~300k lineitem rows on ONE join key, the Beatles
# problem in miniature. The CASE is written once here and reused in
# the oracle so both engines derive the identical skew.
_HOT_KEY_SQL = "CASE WHEN l_partkey % 2 = 0 THEN 1 ELSE l_partkey END"


@register(
    "j_skew_salted_join",
    survey_ids=(),
    oracle=f"""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       {money_sum_sql("l.l_quantity")} AS sum_qty
FROM (SELECT {_HOT_KEY_SQL} AS skew_key, l_quantity FROM lineitem) l
JOIN part p ON l.skew_key = p.p_partkey
GROUP BY p.p_brand
""",
    doc="Skew mitigation as a checked query (SURVEY §4, the Beatles "
    "problem): lineitem's join key is deliberately collapsed so ~half "
    "the rows hit one part, then joined via operators.skew."
    "salted_join (deterministic 8-way salt: hot key spreads over 8 "
    "tasks, build side replicated 8x). The oracle is the PLAIN join "
    "— the salt must not change a single row. At 100 TB this is the "
    "deterministic-layout fallback for skew AQE can't split.",
)
def j_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join  # noqa: PLC0415

    li = t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_partkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("skew_key"),
        "l_quantity",
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, part, on=("skew_key", "p_partkey"), n_salts=N_SALTS)
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_items"),
        money_sum(F.col("l_quantity")).alias("sum_qty"),
    )


@register(
    "s4_bucketed_join_roundtrip",
    survey_ids=("S4",),
    oracle="""
SELECT o.o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey, c.c_mktsegment
""",
    doc="Bucketed tables end-to-end (the reference's B-tree index "
    "replacement, sql/2:17-18,45,53-54): orders and customer are "
    "written as 8-bucket managed tables hash-clustered on custkey, "
    "read back, merge-joined and aggregated ON THE BUCKET KEY — the "
    "whole plan runs without one shuffle exchange (bucketing supplies "
    "the distribution for both the join and the groupBy; "
    "tests/test_bucketing.py asserts it). At 100 TB this is the "
    "co-located fact-fact join lever.",
)
def s4_bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.bucketing import write_bucketed  # noqa: PLC0415

    from .etl import SINK_ROOT  # noqa: PLC0415

    # per-sf table names: a table written for one sf must not be read
    # back by a builder for another sf in the same process; explicit
    # external locations under the per-process sink root so the write
    # never depends on the (possibly foreign) session's warehouse dir
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    t_orders = f"b4_orders_{tag}"
    t_customer = f"b4_customer_{tag}"
    write_bucketed(
        t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        t_orders,
        bucket_cols=["o_custkey"],
        num_buckets=N_BUCKETS,
        sort_cols=["o_custkey"],
        location=f"{SINK_ROOT}/{t_orders}",
    )
    write_bucketed(
        t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        t_customer,
        bucket_cols=["c_custkey"],
        num_buckets=N_BUCKETS,
        sort_cols=["c_custkey"],
        location=f"{SINK_ROOT}/{t_customer}",
    )
    orders_b = spark.table(t_orders)
    customer_b = spark.table(t_customer)
    # merge hint: without it the tiny test-scale sides would broadcast
    # and hide the property under test; at real scale SMJ is what the
    # planner picks anyway and the bucket layout removes its exchanges
    joined = orders_b.join(
        customer_b.hint("merge"),
        orders_b.o_custkey == customer_b.c_custkey,
    )
    return joined.groupBy("o_custkey", "c_mktsegment").agg(
        F.count("*").alias("n_orders")
    )
