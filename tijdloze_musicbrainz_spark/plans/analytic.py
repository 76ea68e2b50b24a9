"""Advanced analytic queries: EXISTS aggregation, conditional
aggregates, disjunctive join predicates, lag/lead windows, ranked
top-n per group, and ROLLUP grouping sets.

These extend the relational tier (TPC-H Q4/Q10/Q12/Q14/Q19 shapes plus
the window-function families the reference's Postgres queries lean on
implicitly through ORDER BY ... LIMIT idioms, e.g. the per-group pick
at src/main.py:210-214).  All survey ids claimed here are carried by
in-window queries, so these register past the driver window without
weakening official coverage (tests/test_registry_window.py).

Scale notes per query are inline; the common theme: every aggregate is
map-side combinable, every window partitions on a bounded-cardinality
key, and the only joins are equi-joins that AQE can re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import register
from .util import money_sum, money_sum_sql, t


@register(
    "q4_priority_exists",
    survey_ids=("J9", "A1"),
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o.o_orderpriority
""",
    doc="TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join, then "
    "count-by-priority. At scale the semi join shuffles only the "
    "orderkey column of the filtered probe side.",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    returned = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q10_returned_revenue",
    survey_ids=("J1", "A1", "O1", "O4"),
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       round(any_value(c.c_acctbal), 2) AS acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: lost-revenue top-20. Fact-fact equi-join "
    "(orders x lineitem) with both filters pushed below the join, then "
    "a customer-key aggregate and a deterministic global top-k "
    "(TakeOrderedAndProject, no full sort).",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.round(F.any_value(F.col("c_acctbal")), 2).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_conditional_agg",
    survey_ids=("A1", "F15"),
    oracle="""
SELECT l.l_linestatus,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
""",
    doc="TPC-H Q12 shape: conditional (CASE WHEN) aggregates — the "
    "pivot-style counting the reference does client-side in "
    "benchmark.py's accuracy fold, kept fully inside one map-side "
    "combinable aggregate.",
)
def q12_priority_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_share",
    survey_ids=("A1", "F15"),
    oracle="""
SELECT round(
         100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))
                    ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE),
         4) AS promo_share_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
    doc="TPC-H Q14 shape: ratio of a conditional sum to a total sum in "
    "ONE aggregate pass (no self-join, no second scan). Exact DECIMAL "
    "accumulation keeps the ratio bit-identical across engines.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(25,6)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo_rev).cast("double") / F.sum(rev).cast("double"), 4
            ).alias("promo_share_pct")
        )
    )


@register(
    "q19_disjunctive_join_predicate",
    survey_ids=("P3", "J1"),
    oracle=f"""
SELECT {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*) AS matched_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 15 AND 30
       AND l.l_quantity BETWEEN 20 AND 40)
""",
    doc="TPC-H Q19 shape: disjunction of conjunctive clauses spanning "
    "both join sides. Catalyst extracts the common p_partkey equi-key "
    "and per-side filters (brand/size to the part scan, quantity to "
    "the lineitem scan) so the OR never forces a nested-loop join.",
)
def q19_disjunctive_join_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    j = li.join(part, part.p_partkey == li.l_partkey)

    def clause(brand: str, smin: int, smax: int, qmin: int, qmax: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )

    return (
        j.filter(
            clause("Brand#1", 1, 10, 1, 20)
            | clause("Brand#2", 5, 20, 10, 30)
            | clause("Brand#3", 15, 30, 20, 40)
        ).agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("matched_lines"),
        )
    )


@register(
    "w_lag_order_gaps",
    survey_ids=("A1", "O3"),
    oracle="""
SELECT o_custkey,
       count(*) AS gap_count,
       CAST(sum(gap_seconds) AS BIGINT) AS total_gap_seconds,
       CAST(min(gap_seconds) AS BIGINT) AS min_gap_seconds
FROM (
  SELECT o_custkey,
         CAST(floor(epoch(o_orderdate)) AS BIGINT)
           - lag(CAST(floor(epoch(o_orderdate)) AS BIGINT))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS gap_seconds
  FROM orders
)
WHERE gap_seconds IS NOT NULL
GROUP BY o_custkey
""",
    doc="lag() inter-order gaps per customer — the window-function twin "
    "of the sessionizer's gap detection (plans/events.py). One shuffle "
    "on o_custkey serves both the window and the downstream aggregate "
    "(Catalyst reuses the hash partitioning); integer epoch arithmetic "
    "keeps the result engine-exact.",
)
def w_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    ep = F.unix_timestamp("o_orderdate").cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("gap_seconds", ep - F.lag(ep).over(w))
        .filter(F.col("gap_seconds").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("gap_count"),
            F.sum("gap_seconds").cast("long").alias("total_gap_seconds"),
            F.min("gap_seconds").cast("long").alias("min_gap_seconds"),
        )
    )


@register(
    "w_rank_topn_per_group",
    survey_ids=("O4", "A5"),
    oracle="""
SELECT c_nationkey, rank_in_nation, c_custkey, round(c_acctbal, 2) AS acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rank_in_nation
  FROM customer
)
WHERE rank_in_nation <= 3
""",
    doc="row_number top-3 per nation: the classic ranked top-n-per-group. "
    "Unlike the min_by/max_by argmin queries (A5/A8, which stay "
    "map-side combinable and are preferred for top-1), top-n>1 needs "
    "the window; the partition key is bounded (25 nations) and ties "
    "break deterministically on c_custkey.",
)
def w_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        t(spark, sf_dir, "customer")
        .withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .select(
            "c_nationkey",
            "rank_in_nation",
            "c_custkey",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        )
    )


@register(
    "a_rollup_grouping_sets",
    survey_ids=("A1", "J1"),
    oracle=f"""
SELECT coalesce(n.n_name, '<all>') AS nation,
       coalesce(c.c_mktsegment, '<all>') AS segment,
       CAST(GROUPING(n.n_name, c.c_mktsegment) AS INT) AS gid,
       count(*) AS customers,
       {money_sum_sql('c.c_acctbal')} AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
""",
    doc="ROLLUP grouping sets with GROUPING() markers — subtotal tiers "
    "(nation x segment, nation, grand total) in ONE pass. Spark expands "
    "the rollup before the exchange so partial aggregation still "
    "applies; the broadcast nation join never shuffles the fact side.",
)
def a_rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("customers"),
            money_sum(F.col("c_acctbal")).alias("total_acctbal"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("<all>")).alias("nation"),
            F.coalesce(F.col("c_mktsegment"), F.lit("<all>")).alias("segment"),
            "gid",
            "customers",
            "total_acctbal",
        )
    )


@register(
    "w_percentile_ranks",
    survey_ids=("O1", "A5"),
    oracle="""
SELECT c_nationkey, c_custkey,
       CAST(round(CAST(percent_rank() OVER w AS DECIMAL(25,12)), 6)
            AS DOUBLE) AS pct_rank,
       CAST(round(CAST(cume_dist() OVER w AS DECIMAL(25,12)), 6)
            AS DOUBLE) AS cum_dist,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
    doc="Relative-standing window functions: percent_rank, cume_dist "
    "and quartile ntile over account balance within each nation — "
    "one window spec serves all three (single exchange + sort). The "
    "ordering key carries the c_custkey tiebreak, so ranks are total "
    "and deterministic; both ratios are (rank-based integer "
    "arithmetic) / (partition count), identical doubles across "
    "engines — but the 6-dp OUTPUT rounding goes through "
    "decimal(25,12) on both sides: round(double, 6) diverges at 1e-6 "
    "boundaries (cume_dist 41/640 = .0640625 split .064063 vs "
    ".064062 at sf0.1 — caught by the r11 sweep; sf0.01 partition "
    "sizes never landed a rank on a boundary).",
)
def w_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.round(F.percent_rank().over(w).cast("decimal(25,12)"), 6)
        .cast("double")
        .alias("pct_rank"),
        F.round(F.cume_dist().over(w).cast("decimal(25,12)"), 6)
        .cast("double")
        .alias("cum_dist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "a_cube_grouping_sets",
    survey_ids=("A1", "J1"),
    oracle=f"""
SELECT coalesce(n.n_name, '<all>') AS nation,
       coalesce(c.c_mktsegment, '<all>') AS segment,
       CAST(GROUPING(n.n_name, c.c_mktsegment) AS INT) AS gid,
       count(*) AS customers,
       {money_sum_sql('c.c_acctbal')} AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY CUBE(n.n_name, c.c_mktsegment)
""",
    doc="CUBE grouping sets — all FOUR tiers in one pass: (nation x "
    "segment), nation subtotals, SEGMENT subtotals (the set ROLLUP "
    "omits: rollup is hierarchical, cube is the full lattice), and "
    "the grand total, disambiguated by GROUPING() because a real "
    "NULL group value and a subtotal row are otherwise "
    "indistinguishable. Same single-pass expansion + partial "
    "aggregation as the rollup twin; at 100 TB the expansion factor "
    "is 2^k grouping sets — the reason you cube two or three "
    "dimensions, never ten.",
)
def a_cube_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .cube("n_name", "c_mktsegment")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("customers"),
            money_sum(F.col("c_acctbal")).alias("total_acctbal"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("<all>")).alias("nation"),
            F.coalesce(F.col("c_mktsegment"), F.lit("<all>")).alias("segment"),
            "gid",
            "customers",
            "total_acctbal",
        )
    )
