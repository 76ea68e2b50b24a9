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


# -- exact-integer PageRank -------------------------------------------------

PR_SCALE = 1_000_000_000  # micro-rank fixed point: ranks in units of 1e-9
PR_ITERS = 3
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def _pr_oracle() -> str:
    it_prev = "r0"
    its = []
    for i in range(1, PR_ITERS + 1):
        its.append(f"""
it{i} AS (
  SELECT e.v AS u,
         (SELECT base FROM consts)
         + ({PR_DAMP_NUM} * sum(r.r // d.deg)) // {PR_DAMP_DEN} AS r
  FROM edges e
  JOIN {it_prev} r ON r.u = e.u
  JOIN deg d ON d.u = e.u
  GROUP BY e.v
)""")
        it_prev = f"it{i}"
    return f"""
WITH pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
consts AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST({PR_SCALE} AS BIGINT) // nullif(count(*), 0) AS r_init,
         ({PR_DAMP_DEN - PR_DAMP_NUM} * CAST({PR_SCALE} AS BIGINT))
           // nullif({PR_DAMP_DEN} * count(*), 0) AS base
  FROM deg
),
r0 AS (SELECT u, (SELECT r_init FROM consts) AS r FROM deg),
{",".join(its)}
SELECT CASE WHEN u % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       CAST(u // 2 AS BIGINT) AS node_key,
       CAST(r AS BIGINT) AS rank_nano
FROM it{PR_ITERS}
"""


@register(
    "graph_pagerank_exact_int",
    survey_ids=(),
    oracle=_pr_oracle(),
    doc="PageRank (3 unrolled power iterations, damping 0.85) over the "
    "undirected customer-supplier bipartite graph from orders x "
    "lineitem — the iterative-graph tier beside connected components. "
    "EXACT-INTEGER fixed point: ranks live in 1e-9 units and every "
    "step is integer floor division ((85*sum)//100, base = "
    "(15*SCALE)//(100*n)), so the per-node sums are order-free and "
    "the DuckDB unrolled-CTE twin is bit-identical — float PageRank "
    "could never hash-match across engines (summation order). Plan "
    "shape per iteration: edges JOIN ranks JOIN degrees + one hash "
    "aggregate on the destination — three shuffle-bounded rounds, "
    "no driver-side data; at 100 TB the rank/degree relation "
    "pre-partitions on u so each iteration reuses the partitioning "
    "(no re-shuffle of edges), and iterations extend to convergence "
    "with the same checkpoint cadence as connected_components.",
)
def graph_pagerank_exact_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = edges.groupBy("u").agg(F.count("*").cast("long").alias("deg"))
    consts = deg.agg(
        F.count("*").cast("long").alias("n"),
        # nullif: an EMPTY graph must yield NULL consts (and an empty
        # result), not an ANSI integer-divide-by-zero when the global
        # agg row evaluates (hostile-input rule)
        F.expr(
            f"CAST({PR_SCALE} AS BIGINT) div nullif(count(*), 0)"
        ).alias("r_init"),
        F.expr(
            f"({PR_DAMP_DEN - PR_DAMP_NUM} * CAST({PR_SCALE} AS BIGINT)) "
            f"div nullif({PR_DAMP_DEN} * count(*), 0)"
        ).alias("base"),
    )
    ranks = deg.crossJoin(F.broadcast(consts)).select(
        "u", F.col("r_init").alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, "u")
            .join(deg, "u")
            .select("v", F.expr("r div deg").alias("c"))
        )
        summed = contrib.groupBy("v").agg(
            F.expr(f"({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}").alias("s")
        )
        ranks = summed.crossJoin(F.broadcast(consts)).select(
            F.col("v").alias("u"), (F.col("base") + F.col("s")).alias("r")
        )
    return ranks.select(
        F.when(F.col("u") % 2 == 0, "customer")
        .otherwise("supplier")
        .alias("node_type"),
        F.expr("u div 2").cast("long").alias("node_key"),
        F.col("r").cast("long").alias("rank_nano"),
    )
