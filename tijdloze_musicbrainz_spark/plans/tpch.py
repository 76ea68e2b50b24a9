"""The remaining TPC-H-shaped queries (q2..q22) over the driver's
reduced TPC-H schema.

Rounds 1-4 registered the TPC-H headliners the reference's operator
inventory maps onto directly (q1/q3/q4/q5/q6/q10/q12/q14/q19).  This
module completes the suite: the query *shapes* (correlated scalar
min, left-outer distribution, HAVING over a scalar subquery, nested
IN, EXISTS/NOT-EXISTS self-joins, anti-join with a scalar-average
threshold) are preserved, but predicates are adapted to the reduced
schema — there is no ``partsupp`` table (lineitem serves as the
part↔supplier bridge), no ``l_receiptdate``/``l_commitdate`` (late =
shipped >60 days after the order date), and no ``c_phone`` (the
country code is derived from ``c_nationkey``).

Cross-engine determinism notes (the driver hash-compares values):
- money aggregates go through ``money_sum``/``money_avg`` (exact
  DECIMAL accumulation, then one rounding);
- threshold comparisons against an average are restated as exact
  integer/decimal cross-multiplications (q17: ``qty * 5 * cnt <
  sum_qty`` instead of ``qty < 0.2 * avg``), so no engine ever
  rounds near the boundary;
- equality joins on computed doubles only ever use values produced
  by a single IEEE-754 operation (q2's ``min(price/qty)``), never an
  accumulation.

Scale discipline: dims (region, nation, supplier, part) broadcast;
every correlated subquery is decorrelated into an aggregate + equi-
join (A2/A4 pattern, reference src/main.py:130-144); per-order /
per-part statistics aggregate BEFORE joining back (map-side combine
shrinks the shuffle); no windows over constant keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .util import (
    epoch,
    epoch_sql,
    money_sum,
    money_sum_sql,
    t,
)

_DEC = "decimal(25,6)"


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier (decorrelated scalar MIN, A2)
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    survey_ids=("A2", "J1", "A1"),
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eligible AS (
  SELECT ps.l_partkey, ps.supplycost, s.s_name, s.s_acctbal, n.n_name
  FROM ps
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), minc AS (
  SELECT l_partkey, min(supplycost) AS min_cost
  FROM eligible GROUP BY l_partkey
)
SELECT e.s_acctbal, e.s_name, e.n_name,
       e.l_partkey AS p_partkey, p.p_type,
       CAST(round(CAST(e.supplycost AS DECIMAL(25,6)), 2) AS DOUBLE)
         AS supplycost
FROM eligible e
JOIN minc m ON e.l_partkey = m.l_partkey AND e.supplycost = m.min_cost
JOIN part p ON e.l_partkey = p.p_partkey
WHERE p.p_size = 25
""",
    doc="TPC-H Q2 shape: per-part minimum supply cost as a decorrelated "
    "scalar-MIN (A2) — lineitem stands in for partsupp; the equality "
    "join is on a single-division double (bit-identical across "
    "engines). The OUTPUT rounding goes through decimal(25,6) on both "
    "sides (the money_sum convention): round(double, 2) diverges at "
    "cent boundaries — Spark rounds the decimal rendering HALF_UP "
    "while DuckDB rounds the binary double, so 539.805 (stored "
    "539.80499...) split 539.81 vs 539.80. Caught by the r11 sf0.1 "
    "sweep; invisible at sf0.01 where no value sat on a boundary.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 25)

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    eligible = (
        ps.join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("l_partkey", "supplycost", "s_name", "s_acctbal", "n_name")
    )
    # A2 decorrelation: the correlated `WHERE cost = (SELECT min ...)`
    # becomes an aggregate + equi-join (reference src/main.py:130-144).
    minc = eligible.groupBy("l_partkey").agg(F.min("supplycost").alias("min_cost"))
    return (
        eligible.join(
            minc,
            (eligible.l_partkey == minc.l_partkey)
            & (eligible.supplycost == minc.min_cost),
        )
        .drop(minc.l_partkey)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_type",
            F.round(F.col("supplycost").cast(_DEC), 2)
            .cast("double")
            .alias("supplycost"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two regions
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    survey_ids=("J1", "P3", "A1"),
    oracle=f"""
SELECT supp_region, cust_region, l_year,
       {money_sum_sql('volume')} AS revenue
FROM (
  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE ((r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
         OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
) GROUP BY supp_region, cust_region, l_year
""",
    doc="TPC-H Q7 shape: supplier-region vs customer-region trade volume "
    "by year with the disjunctive pair predicate (P3); regions replace "
    "nations so the pair is populated at every SF.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")

    # Pre-resolve each side's nation→region as tiny broadcast dims.
    supp_region = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    cust_region = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_region), li.l_suppkey == supp_region.s_suppkey)
        .join(F.broadcast(cust_region), orders.o_custkey == cust_region.c_custkey)
        .filter(
            ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
            | ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
        )
    )
    return joined.groupBy(
        "supp_region", "cust_region", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q8 — market share (conditional aggregation over a ratio)
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    survey_ids=("A1", "F15", "J1"),
    oracle="""
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_region = 'EUROPE'
                           THEN CAST(volume AS DECIMAL(25,6))
                           ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
             / CAST(sum(CAST(volume AS DECIMAL(25,6))) AS DOUBLE),
             4) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         r1.r_name AS supp_region
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
  WHERE r2.r_name = 'ASIA'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
) GROUP BY o_year
""",
    doc="TPC-H Q8 shape: EUROPE suppliers' share of the ASIA ECONOMY "
    "market by order year — conditional DECIMAL-exact sums divided "
    "once, rounded once.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")

    supp_region = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    asia_cust = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("c_custkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(asia_cust), orders.o_custkey == asia_cust.c_custkey)
        .join(F.broadcast(supp_region), li.l_suppkey == supp_region.s_suppkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.cast(_DEC).alias("volume_dec"),
            "supp_region",
        )
    )
    zero = F.lit(0).cast(_DEC)
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_region") == "EUROPE", F.col("volume_dec")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume_dec").cast("double"),
            4,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------


@register(
    "q9_product_type_profit",
    survey_ids=("J1", "A1", "F15"),
    oracle=f"""
SELECT nation, o_year, {money_sum_sql('amount')} AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - 0.1 * p.p_retailprice * l.l_quantity AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%bolt%'
) GROUP BY nation, o_year
""",
    doc="TPC-H Q9 shape: profit by supplier nation × order year; "
    "0.1 × p_retailprice × quantity proxies ps_supplycost (no partsupp "
    "in the reduced schema).",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))

    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(money_sum(amount).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock (HAVING over a global scalar)
# ---------------------------------------------------------------------------


@register(
    "q11_important_stock",
    survey_ids=("A1", "J1", "F15"),
    oracle="""
WITH v AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(25,6))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
  GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey,
       CAST(round(value_dec, 2) AS DOUBLE) AS part_value
FROM v
WHERE CAST(value_dec AS DOUBLE) >
      (SELECT CAST(sum(value_dec) AS DOUBLE) * 2.0 / count(*) FROM v)
""",
    doc="TPC-H Q11 shape: per-part inventory value for one region's "
    "suppliers, kept only when above a fraction of the global total — "
    "the scalar subquery decorrelates to a broadcast one-row join. The "
    "fraction is 2× the mean part value (scale-free, unlike the spec's "
    "fixed 0.0001/SF, so the result is non-degenerate at every SF).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    v = (
        li.join(F.broadcast(asia_supp), li.l_suppkey == asia_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(_DEC)
            ).alias("value_dec")
        )
    )
    total = v.agg(
        (F.sum("value_dec").cast("double") * 2.0 / F.count("*")).alias("threshold")
    )
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value_dec", 2).cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer + double grouping)
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    survey_ids=("J3", "A1", "A4"),
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count
""",
    doc="TPC-H Q13 shape: left-outer join with an ON-side residual "
    "predicate, per-customer count (NULL-safe, A4), then the "
    "distribution of those counts.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        # count(col) skips the NULLs produced by unmatched customers —
        # same semantics as the oracle's count(o_orderkey).
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 — top supplier (view + scalar MAX)
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    survey_ids=("A2", "A1", "J1"),
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 shape: quarterly revenue view, then the supplier(s) "
    "achieving the global max — the scalar MAX decorrelates to a "
    "broadcast one-row join; equality is on identically-rounded "
    "DECIMAL-exact sums.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (NOT IN anti-join, COUNT DISTINCT)
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_part_count",
    survey_ids=("J9", "P5", "A1"),
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_size IN (1, 5, 9, 14, 20, 28, 33, 42)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 500.0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    doc="TPC-H Q16 shape: COUNT DISTINCT suppliers per part attribute "
    "triple, excluding low-balance suppliers via NOT IN (anti-join on "
    "a non-null key, J9); s_acctbal < 500 replaces the comment-pattern "
    "exclusion.",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 28, 33, 42)
    )
    bad_supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 500.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG, exactly decorrelated)
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    survey_ids=("A2", "F15", "A1"),
    oracle="""
WITH stats AS (
  SELECT l_partkey,
         sum(CAST(l_quantity AS DECIMAL(25,6))) AS sum_qty,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN stats st ON st.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#5'
  AND CAST(l.l_quantity AS DECIMAL(25,6)) * 5 * st.cnt < st.sum_qty
""",
    doc="TPC-H Q17 shape: lineitems below 20% of the part's average "
    "quantity. The correlated AVG is decorrelated AND made exact: "
    "`qty < 0.2*avg` is restated as `qty*5*cnt < sum_qty` over DECIMAL "
    "sums, so neither engine divides near the boundary.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    stats = li.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(stats, li.l_partkey == stats.sp_partkey)
        .filter(
            F.col("l_quantity").cast(_DEC) * 5 * F.col("cnt") < F.col("sum_qty")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING + join back)
# ---------------------------------------------------------------------------


@register(
    "q18_large_volume_customer",
    survey_ids=("A1", "J1", "P5"),
    oracle=f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(25,6))) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       {epoch_sql('o.o_orderdate')} AS orderdate_epoch,
       o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
    doc="TPC-H Q18 shape: orders whose total quantity clears a HAVING "
    "threshold (DECIMAL-exact), joined back with customer context. The "
    "SQL shape (the oracle's) semi-joins and re-aggregates lineitem a "
    "second time; the Spark plan instead CARRIES the per-order sum out "
    "of the HAVING aggregate — one lineitem aggregation instead of "
    "two, one fewer shuffle, identical result (measured 4.9s -> "
    "~2s at sf0.1).",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("order_qty"))
        .filter(F.col("order_qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            epoch("o_orderdate").alias("orderdate_epoch"),
            "o_totalprice",
            F.col("order_qty").cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN + HAVING)
# ---------------------------------------------------------------------------


@register(
    "q20_potential_promotion",
    survey_ids=("J9", "A1", "P6"),
    oracle="""
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AFRICA'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_type = 'PROMO'
      )
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey
    HAVING sum(CAST(l_quantity AS DECIMAL(25,6))) > 50
  )
""",
    doc="TPC-H Q20 shape: suppliers in one region who moved a material "
    "volume of PROMO parts in 1997 — nested IN subqueries become "
    "semi-joins, the volume threshold is a DECIMAL-exact HAVING.",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    promo = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    movers = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(promo), li.l_partkey == promo.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(movers), supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_supplier",
    survey_ids=("J9", "A1", "A4"),
    oracle="""
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
), order_stats AS (
  SELECT l_orderkey,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
  FROM lineitem GROUP BY l_orderkey
), late_stats AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_late
  FROM late GROUP BY l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late
JOIN order_stats os ON late.l_orderkey = os.l_orderkey
JOIN late_stats ls ON late.l_orderkey = ls.l_orderkey
JOIN supplier s ON late.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND os.n_supp >= 2
  AND ls.n_late = 1
GROUP BY s.s_name
""",
    doc="TPC-H Q21 shape: the sole late supplier on a multi-supplier "
    "finished order. EXISTS (another supplier on the order) and NOT "
    "EXISTS (another LATE supplier) are decorrelated into per-order "
    "counts — `n_supp >= 2 AND n_late = 1`; late = shipped >60 days "
    "after the order date (no receipt/commit dates in this schema).",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    order_stats = li.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_stats = late.groupBy(F.col("l_orderkey").alias("ls_orderkey")).agg(
        F.count("*").alias("n_late")
    )
    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    return (
        late.join(order_stats, late.l_orderkey == F.col("os_orderkey"))
        .join(late_stats, late.l_orderkey == F.col("ls_orderkey"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(euro_supp), late.l_suppkey == euro_supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar AVG threshold + anti-join)
# ---------------------------------------------------------------------------


@register(
    "q22_global_sales_opportunity",
    survey_ids=("J9", "A2", "A1"),
    oracle=f"""
WITH threshold AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
         / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
), urgent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT CAST(c.c_nationkey % 5 AS BIGINT) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       {money_sum_sql('c.c_acctbal')} AS totacctbal
FROM customer c, threshold t
WHERE c.c_acctbal > t.avg_bal
  AND c.c_nationkey % 5 IN (0, 1, 2, 3)
  AND c.c_custkey NOT IN (SELECT o_custkey FROM urgent)
GROUP BY c.c_nationkey % 5
""",
    doc="TPC-H Q22 shape: above-average-balance customers with no "
    "URGENT orders, grouped by country code (nationkey-derived — no "
    "phone column; every customer has orders at these SFs, so the "
    "anti-join is against URGENT orders to stay non-degenerate). The "
    "scalar AVG is an exact decimal-sum/count broadcast.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count("*")).alias(
            "avg_bal"
        )
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    cntry = (F.col("c_nationkey") % 5).cast("long")
    return (
        cust.join(F.broadcast(threshold))
        .filter(
            (F.col("c_acctbal") > F.col("avg_bal")) & cntry.isin(0, 1, 2, 3)
        )
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(cntry.alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
