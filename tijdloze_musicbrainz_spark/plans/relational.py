"""Relational operator inventory (SURVEY §2.2-§2.7) as QuerySpecs.

Each query exercises one or more reference operators against the
driver's TPC-H-ish testdata, with a DuckDB oracle twin. The flagship
(`flagship_canonical_order`) is the Milestone-1 vertical slice: the
reference's per-group canonical selection (J1 + A1 + F7 + A8,
``/root/reference/src/main.py:130-144,50-73,242``) re-shaped onto
lineitem/orders/part.

Scale discipline applied throughout:
- small dims (region, nation) joined with explicit ``F.broadcast``;
- aggregation before join where it shrinks the build side (A2/A4
  decorrelation);
- window partitions keyed on high-cardinality keys (partkey/custkey),
  never on a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.normalize import clean_sql, search_key, search_key_sql
from ..operators.canonical import (
    argmax_with_threshold,
    argmin_per_group,
    top1_per_group,
)
from ..operators.upsert import accuracy_report
from .registry import register
from .util import (
    epoch,
    epoch_sql,
    fan_out,
    money_avg,
    money_avg_sql,
    money_sum,
    money_sum_sql,
    round2,
    t,
)

# ---------------------------------------------------------------------------
# Flagship — Milestone 1 vertical slice
# ---------------------------------------------------------------------------


@register(
    "flagship_canonical_order",
    survey_ids=("J1", "A1", "F7", "A8", "O3"),
    oracle=f"""
WITH cand AS (
  SELECT p.p_partkey, p.p_name, o.o_orderkey,
         {epoch_sql('min(l.l_shipdate)')} AS first_ship_epoch,
         CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
         (o.o_orderpriority = '1-URGENT') AS is_urgent,
         o.o_orderstatus AS status
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_partkey, p.p_name, o.o_orderkey, year(o.o_orderdate),
           o.o_orderpriority, o.o_orderstatus
), scored AS (
  SELECT p_partkey, p_name, o_orderkey, first_ship_epoch,
         CASE WHEN is_urgent OR status = 'F' THEN order_year
              ELSE order_year + 1 END AS year_value,
         CASE WHEN is_urgent THEN 0 ELSE 1 END AS ref_priority,
         CASE WHEN status = 'F' THEN 1 WHEN status = 'P' THEN 2
              WHEN status = 'O' THEN 3 ELSE 4 END AS type_priority
  FROM cand
)
SELECT p_partkey, p_name, o_orderkey, first_ship_epoch,
       year_value, ref_priority, type_priority
FROM scored
QUALIFY row_number() OVER (
  PARTITION BY p_partkey
  ORDER BY year_value, ref_priority, type_priority, o_orderkey) = 1
""",
    doc="Per-part canonical order: multi-join -> group-min -> when-chain "
    "sort key -> window top-1 (the reference's src/main.py:242 heart).",
)
def flagship_canonical_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")

    # p_name is functionally determined by p_partkey (one part row per
    # key), so carrying it through BOTH aggregates only widened every
    # exchange by the name bytes on ~|lineitem| rows (guide §2.3 —
    # shuffle fewer bytes). It is attached by one broadcast join to
    # the ~|parts| argmin winners at the end instead; grouping on
    # p_partkey alone produces the identical groups, and the argmin
    # order never referenced the name, so results are unchanged (and
    # the inner part join cannot drop or multiply rows: every
    # l_partkey has exactly one part row).
    cand = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("p_partkey"),
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("order_year"),
            (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(epoch(F.min("l_shipdate")).alias("first_ship_epoch"))
    )
    scored = cand.select(
        "p_partkey",
        "o_orderkey",
        "first_ship_epoch",
        F.when(F.col("is_urgent") | (F.col("status") == "F"), F.col("order_year"))
        .otherwise(F.col("order_year") + 1)
        .alias("year_value"),
        F.when(F.col("is_urgent"), 0).otherwise(1).alias("ref_priority"),
        F.when(F.col("status") == "F", 1)
        .when(F.col("status") == "P", 2)
        .when(F.col("status") == "O", 3)
        .otherwise(4)
        .alias("type_priority"),
    )
    # Argmin via min_by aggregation, not a window: map-side partial
    # combine keeps a hot p_partkey balanced at 100× (see
    # operators.canonical.argmin_per_group).
    # No broadcast hint on the name-attach join (r15 ADVICE): the
    # part scan is parquet-backed, so the planner auto-broadcasts it
    # off real size stats whenever it fits autoBroadcastJoinThreshold
    # — and at a production |part| that would blow the broadcast
    # budget, the estimate-driven fallback to a shuffled join is
    # exactly what we want. A forced hint overrode that safety for
    # zero plan benefit at any SF where the hint fires anyway.
    return (
        argmin_per_group(
            scored,
            ["p_partkey"],
            ["year_value", "ref_priority", "type_priority", "o_orderkey"],
        )
        .join(part.select("p_partkey", "p_name"), "p_partkey")
        .select(
            "p_partkey",
            "p_name",
            "o_orderkey",
            "first_ship_epoch",
            "year_value",
            "ref_priority",
            "type_priority",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped headliners (bench anchors)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    survey_ids=("A1", "F15", "O1"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {money_sum_sql('l_quantity')} AS sum_qty,
       {money_sum_sql('l_extendedprice')} AS sum_base_price,
       {money_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {money_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {money_avg_sql('l_quantity')} AS avg_qty,
       {money_avg_sql('l_extendedprice')} AS avg_price,
       {money_avg_sql('l_discount', 4)} AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape: scan-filter-aggregate with 8 aggregates.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out after projecting the 6 agg inputs: the single-row-group
    # scan ran the 8 exact-DECIMAL aggregates as ONE task (the decimal
    # arithmetic, not the decode, dominates — measured 1.73 s -> 0.89 s
    # solo at sf0.1, identical results: decimal sums are associative-
    # exact so partial-agg order cannot matter). Partition-count-gated
    # no-op at production scale (plans/util.fan_out).
    li = fan_out(
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "2000-09-02")
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(F.col("l_quantity")).alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        money_sum(disc_price).alias("sum_disc_price"),
        money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        money_avg(F.col("l_quantity")).alias("avg_qty"),
        money_avg(F.col("l_extendedprice")).alias("avg_price"),
        money_avg(F.col("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    survey_ids=("J1", "A1", "O1", "O4"),
    oracle=f"""
SELECT l.l_orderkey,
       {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       {epoch_sql('o.o_orderdate')} AS orderdate_epoch,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape: 3-way join, agg, global deterministic top-k.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            epoch("o_orderdate").alias("orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    survey_ids=("J1", "J2", "A1"),
    oracle=f"""
SELECT n.n_name,
       {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
    doc="TPC-H Q5 shape: 6-table join with cross-branch equality (J2) "
    "and broadcast dims.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        # J2: the supplier must sit in the customer's nation — an extra
        # cross-branch equality in the join condition, like the
        # reference's artist_credit_name_rg.artist = acn.artist
        # (src/main.py:142).
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "q6_forecast_revenue",
    survey_ids=("P2", "F15"),
    oracle=f"""
SELECT {money_sum_sql('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: pure pushed-down filter + single aggregate.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Filters / predicates (P-series)
# ---------------------------------------------------------------------------


@register(
    "p_disjunctive_filter",
    survey_ids=("P3",),
    oracle="""
SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_nationkey = 3 OR c_acctbal > 9000
""",
    doc="Artist-universe cut analog (sql/3:10): country OR popularity.",
)
def p_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter((F.col("c_nationkey") == 3) | (F.col("c_acctbal") > 9000))
        .select("c_custkey", "c_name", "c_nationkey", round2(F.col("c_acctbal")).alias("acctbal"))
    )


@register(
    "p_in_list",
    survey_ids=("P5",),
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
""",
    doc="IN-list predicate (benchmark.py:93-95).",
)
def p_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "p_prefix_like",
    survey_ids=("P6",),
    oracle="SELECT p_partkey, p_name FROM part WHERE p_name LIKE 'bl%'",
    doc="Cheap phase-1 prefix match (benchmark.py:85).",
)
def p_prefix_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("bl"))
        .select("p_partkey", "p_name")
    )


@register(
    "p_levenshtein_bounded",
    survey_ids=("P7", "P8", "F4", "F5"),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE length(c_name) < 255 AND levenshtein(c_name, 'Customer#000000042') <= 1
""",
    doc="Length-guarded bounded edit distance (benchmark.py:76-77,88-90); "
    "Spark uses the threshold form (early-exit, like "
    "levenshtein_less_equal).",
)
def p_levenshtein_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter(
            (F.length("c_name") < 255)
            & (F.levenshtein(F.col("c_name"), F.lit("Customer#000000042"), 1) >= 0)
        )
        .select("c_custkey", "c_name")
    )


@register(
    "p_derived_boolean_flags",
    survey_ids=("P11", "F16", "A3"),
    oracle="""
WITH g AS (
  SELECT l_orderkey, list_sort(array_agg(DISTINCT l_returnflag)) AS flags
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       array_to_string(flags, ',') AS flags_set,
       (len(flags) = 1 AND flags[1] = 'N') AS is_clean,
       list_contains(flags, 'R') AS has_returns,
       list_contains(flags, 'A') AS has_alt
FROM g
""",
    doc="Derived booleans over a collected array column "
    "(is_main_album/is_compilation analogs, src/main.py:30-37).",
)
def p_derived_boolean_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_returnflag")).alias("flags")
    )
    return g.select(
        "l_orderkey",
        F.array_join("flags", ",").alias("flags_set"),
        ((F.size("flags") == 1) & (F.element_at("flags", 1) == "N")).alias("is_clean"),
        F.array_contains("flags", "R").alias("has_returns"),
        F.array_contains("flags", "A").alias("has_alt"),
    )


@register(
    "f_coalesce_sentinel",
    survey_ids=("P4", "F3"),
    oracle="""
SELECT o_orderkey,
       coalesce(nullif(CAST(year(o_orderdate) AS BIGINT), 1995), 9999) AS year_value
FROM orders
""",
    doc="NULL sentinel handling (release_year is None -> 9999, "
    "src/main.py:51-52) via nullif/coalesce.",
)
def f_coalesce_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.year("o_orderdate").cast("long"), F.lit(1995)), F.lit(9999)
        ).alias("year_value"),
    )


# ---------------------------------------------------------------------------
# Joins (J-series)
# ---------------------------------------------------------------------------


@register(
    "j_multiway_candidates",
    survey_ids=("J1", "J2", "J7"),
    oracle=f"""
SELECT r.r_name, p.p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       {money_sum_sql('l.l_extendedprice')} AS gross
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE o.o_orderstatus = 'F' AND ns.n_regionkey = nc.n_regionkey
GROUP BY r.r_name, p.p_brand
""",
    doc="8-table candidate join chain with two aliased dim branches and "
    "a cross-branch equality — the reference's 10-table candidate "
    "query shape (src/main.py:130-142).",
)
def j_multiway_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = t(spark, sf_dir, "customer")
    nation_c = t(spark, sf_dir, "nation").alias("nc")
    nation_s = t(spark, sf_dir, "nation").alias("ns")
    region = t(spark, sf_dir, "region")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation_s),
            (supp.s_nationkey == F.col("ns.n_nationkey"))
            & (F.col("ns.n_regionkey") == F.col("nc.n_regionkey")),
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("r_name", "p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            money_sum(F.col("l_extendedprice")).alias("gross"),
        )
    )


@register(
    "j_left_outer_counts",
    survey_ids=("J3", "J4", "A4"),
    oracle="""
SELECT c.c_custkey,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(count(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_finished
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
    doc="LEFT OUTER join preserving unmatched rows (optional work / "
    "second artist, src/main.py:140-141, benchmark.py:117).",
)
def j_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        )
    )


@register(
    "j_self_coalesce_chain",
    survey_ids=("J5", "F3"),
    oracle="""
SELECT o1.o_orderkey,
       coalesce(
         CASE WHEN o3.o_orderstatus = 'F' THEN o3.o_orderpriority END,
         CASE WHEN o2.o_orderstatus = 'F' THEN o2.o_orderpriority END,
         CASE WHEN o1.o_orderstatus = 'F' THEN o1.o_orderpriority END,
         'NONE') AS resolved_priority
FROM orders o1
LEFT JOIN orders o2 ON o2.o_orderkey = o1.o_orderkey + 1
LEFT JOIN orders o3 ON o3.o_orderkey = o1.o_orderkey + 2
WHERE o1.o_orderkey < 2000
""",
    doc="Depth-3 unrolled self-join with first-non-null COALESCE — the "
    "area part-of chain pattern (sql/1_area_id_country_id.sql:12-19).",
)
def j_self_coalesce_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    o1 = orders.alias("o1").filter(F.col("o_orderkey") < 2000)
    o2 = orders.alias("o2")
    o3 = orders.alias("o3")
    code = lambda a: F.when(  # noqa: E731
        F.col(f"{a}.o_orderstatus") == "F", F.col(f"{a}.o_orderpriority")
    )
    return (
        o1.join(o2, F.col("o2.o_orderkey") == F.col("o1.o_orderkey") + 1, "left")
        .join(o3, F.col("o3.o_orderkey") == F.col("o1.o_orderkey") + 2, "left")
        .select(
            F.col("o1.o_orderkey").alias("o_orderkey"),
            F.coalesce(code("o3"), code("o2"), code("o1"), F.lit("NONE")).alias(
                "resolved_priority"
            ),
        )
    )


@register(
    "j_semi_probe",
    survey_ids=("J9",),
    oracle="""
SELECT p.p_partkey, p.p_name
FROM part p
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE l.l_partkey = p.p_partkey AND s.s_acctbal > 9000
)
""",
    doc="LEFT SEMI join — the single-from hash-probe "
    "(build src/main.py:90-95, probe :203) done set-oriented.",
)
def j_semi_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    probe = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).select("l_partkey")
    return part.join(probe, part.p_partkey == probe.l_partkey, "left_semi").select(
        "p_partkey", "p_name"
    )


@register(
    "j_anti_unmatched",
    survey_ids=("J9", "P2"),
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
""",
    doc="LEFT ANTI join — the phase-2 fallback remainder selection "
    "(benchmark.py:121-126 two-phase plan).",
)
def j_anti_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j_distinct_projected",
    survey_ids=("J11",),
    oracle="""
SELECT DISTINCT c.c_custkey
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE o.o_totalprice > 400000
""",
    doc="DISTINCT-projected join (benchmark.py:71-78,98).",
)
def j_distinct_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .select("c_custkey")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Aggregations (A-series)
# ---------------------------------------------------------------------------


@register(
    "a_groupby_min",
    survey_ids=("A1",),
    oracle=f"""
SELECT l_partkey, {epoch_sql('min(l_shipdate)')} AS first_ship_epoch,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY l_partkey
""",
    doc="GROUP BY + MIN (earliest release year per group, src/main.py:103,143).",
)
def a_groupby_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            epoch(F.min("l_shipdate")).alias("first_ship_epoch"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "a_decorrelated_scalar_min",
    survey_ids=("A2",),
    oracle=f"""
WITH part_first AS (
  SELECT l_partkey, min(l_shipdate) AS first_ship
  FROM lineitem GROUP BY l_partkey
)
SELECT o.o_orderkey,
       {epoch_sql('min(pf.first_ship)')} AS earliest_part_debut_epoch
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN part_first pf ON pf.l_partkey = l.l_partkey
GROUP BY o.o_orderkey
""",
    doc="Correlated scalar MIN subquery (release_group_year, "
    "src/main.py:104-109) decorrelated into pre-aggregate + join.",
)
def a_decorrelated_scalar_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part_first = li.groupBy("l_partkey").agg(F.min("l_shipdate").alias("first_ship"))
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .join(part_first, "l_partkey")
        .groupBy("o_orderkey")
        .agg(epoch(F.min("first_ship")).alias("earliest_part_debut_epoch"))
    )


@register(
    "a_count_score",
    survey_ids=("A4",),
    oracle="""
SELECT s.s_suppkey, s.s_name, CAST(count(l.l_orderkey) AS BIGINT) AS score
FROM supplier s
LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name
""",
    doc="Correlated COUNT(*) as score (artist score = #URL links, "
    "sql/3_artist_data.sql:3) decorrelated.",
)
def a_count_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    return (
        supp.join(li, li.l_suppkey == supp.s_suppkey, "left")
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("l_orderkey").alias("score"))
    )


@register(
    "a_pick_one_deterministic",
    survey_ids=("A5", "O2"),
    oracle="""
SELECT o_custkey AS c_custkey, o_orderkey AS first_orderkey
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
""",
    doc="Correlated LIMIT-1 lookup (language pick, src/main.py:121-128) "
    "made deterministic via a total-order window.",
)
def a_pick_one_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return top1_per_group(
        orders, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")]
    ).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
    )


@register(
    "a_argmax_threshold",
    survey_ids=("A9", "O4"),
    oracle="""
WITH m AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         max(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price
  FROM orders
)
SELECT o_custkey AS c_custkey, o_orderkey AS best_orderkey,
       round(o_totalprice, 2) AS best_price
FROM m
WHERE o_totalprice >= max_price / 10
QUALIFY row_number() OVER (
  PARTITION BY o_custkey
  ORDER BY o_orderdate, o_totalprice DESC, o_orderkey) = 1
""",
    doc="Thresholded argmax re-rank (benchmark.py:128-133): keep rows "
    "within 10x of group max, then earliest-date / highest-price pick.",
)
def a_argmax_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    best = argmax_with_threshold(
        orders,
        ["o_custkey"],
        F.col("o_totalprice"),
        [F.col("o_orderdate"), F.desc("o_totalprice"), F.col("o_orderkey")],
    )
    return best.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("best_orderkey"),
        round2(F.col("o_totalprice")).alias("best_price"),
    )


@register(
    "a_accuracy_report",
    survey_ids=("A11", "S9"),
    oracle="""
WITH f AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
              ELSE o_orderstatus END AS actual,
         'O' AS expected
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN actual IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing,
       CAST(sum(CASE WHEN actual IS NOT NULL AND actual <> expected THEN 1 ELSE 0 END) AS BIGINT) AS wrong,
       CAST(sum(CASE WHEN actual = expected THEN 1 ELSE 0 END) AS BIGINT) AS correct,
       round(100.0 * sum(CASE WHEN actual IS NULL THEN 1 ELSE 0 END) / count(*), 2) AS missing_pct,
       round(100.0 * sum(CASE WHEN actual IS NOT NULL AND actual <> expected THEN 1 ELSE 0 END) / count(*), 2) AS wrong_pct,
       round(100.0 * sum(CASE WHEN actual = expected THEN 1 ELSE 0 END) / count(*), 2) AS correct_pct
FROM f
""",
    doc="Benchmark accuracy fold: correct/missing/wrong + percentages "
    "(benchmark.py:245-274) as one aggregation.",
)
def a_accuracy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    df = orders.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("actual"),
        F.lit("O").alias("expected"),
    )
    return accuracy_report(df, F.col("expected"), F.col("actual"))


# ---------------------------------------------------------------------------
# Set operations (SET-series)
# ---------------------------------------------------------------------------


@register(
    "set_union_distinct_aliases",
    survey_ids=("SET1", "SET2", "A12", "F1"),
    oracle=f"""
SELECT DISTINCT {search_key_sql("name")} AS alias_key FROM (
  SELECT c_name AS name FROM customer
  UNION ALL SELECT s_name FROM supplier
  UNION ALL SELECT p_name FROM part
  UNION ALL SELECT n_name FROM nation
) WHERE {search_key_sql("name")} <> ''
""",
    doc="4-branch UNION-distinct alias generation with normalization "
    "keying (sql/4_artist_alias_data.sql:4-32).",
)
def set_union_distinct_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    pick = lambda tbl, col: t(spark, sf_dir, tbl).select(  # noqa: E731
        F.col(col).alias("name")
    )
    unioned = (
        pick("customer", "c_name")
        .unionByName(pick("supplier", "s_name"))
        .unionByName(pick("part", "p_name"))
        .unionByName(pick("nation", "n_name"))
    )
    return (
        unioned.select(search_key("name").alias("alias_key"))
        .filter(F.col("alias_key") != "")
        .distinct()
    )


@register(
    "set_union_all_pools",
    survey_ids=("SET3",),
    oracle="""
SELECT o_orderkey, pool FROM (
  SELECT o_orderkey, 'urgent' AS pool FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_orderkey, 'high' AS pool FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
)
""",
    doc="Candidate-pool concatenation with tolerated duplicates "
    "(normal + soundtrack pools, src/main.py:227-230).",
)
def set_union_all_pools(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("pool")
    )
    high = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", F.lit("high").alias("pool"))
    return urgent.unionByName(high)


# ---------------------------------------------------------------------------
# Sorts / top-k (O-series) + windows
# ---------------------------------------------------------------------------


@register(
    "o_global_topk",
    survey_ids=("O1", "O3"),
    oracle="""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 20
""",
    doc="Global multi-key ORDER BY + LIMIT (processing order, "
    "src/main.py:352) — deterministic tie-break on the unique key.",
)
def o_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", round2(F.col("c_acctbal")).alias("acctbal"))
    )


@register(
    "w_group_max_threshold",
    survey_ids=("A9",),
    oracle="""
SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS seg_max
  FROM customer
)
WHERE c_acctbal >= seg_max * 0.99
""",
    doc="Window group-max + threshold filter (relevance >= max/10, "
    "benchmark.py:129).",
)
def w_group_max_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment")
    return (
        cust.withColumn("seg_max", F.max("c_acctbal").over(w))
        .filter(F.col("c_acctbal") >= F.col("seg_max") * 0.99)
        .select(
            "c_mktsegment", "c_custkey", round2(F.col("c_acctbal")).alias("acctbal")
        )
    )


# ---------------------------------------------------------------------------
# Scalar-function queries (F-series)
# ---------------------------------------------------------------------------


@register(
    "f_search_key_normalization",
    survey_ids=("F1", "F2", "J11"),
    oracle=f"""
SELECT DISTINCT {search_key_sql("p_name")} AS name_key FROM part
""",
    doc="The search_key workhorse (src/util.py:14-16) as a pure column "
    "expression: unaccent -> lower -> strip non-alphanumerics.",
)
def f_search_key_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "part")
        .select(search_key("p_name").alias("name_key"))
        .distinct()
    )


@register(
    "f_relevance_multiplicative",
    survey_ids=("F9", "F15"),
    oracle="""
SELECT p_partkey,
       round(CAST(p_size AS DOUBLE)
             * CASE WHEN p_size > 25 THEN 10.0 ELSE 1.0 END
             * CASE WHEN p_type = 'ECONOMY' THEN 10.0 ELSE 1.0 END
             * CASE WHEN p_brand = 'Brand#1' THEN 10.0 ELSE 1.0 END,
             2) AS relevance
FROM part
""",
    doc="Multiplicative relevance boosts (benchmark.py:43-49): "
    "score x 10^[flag] factors.",
)
def f_relevance_multiplicative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scoring import relevance_query  # noqa: PLC0415

    part = t(spark, sf_dir, "part")
    rel = relevance_query(
        F.col("p_size"),
        F.col("p_size") > 25,
        F.col("p_type") == "ECONOMY",
        F.col("p_brand") == "Brand#1",
    )
    return part.select("p_partkey", round2(rel).alias("relevance"))


@register(
    "f_split_concat",
    survey_ids=("P1", "F10", "F11"),
    oracle="""
SELECT c_custkey,
       split_part(c_name, '#', 1) AS name_part,
       split_part(c_name, '#', 2) AS num_part,
       concat_ws(' & ', split_part(c_name, '#', 1), c_mktsegment) AS duet_name
FROM customer
""",
    doc="Split on delimiter + concat_ws (duet handling, "
    "benchmark.py:160,178-181).",
)
def f_split_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    parts = F.split(F.col("c_name"), "#")
    return cust.select(
        "c_custkey",
        F.element_at(parts, 1).alias("name_part"),
        F.element_at(parts, 2).alias("num_part"),
        F.concat_ws(" & ", F.element_at(parts, 1), F.col("c_mktsegment")).alias(
            "duet_name"
        ),
    )


# ---------------------------------------------------------------------------
# Rows the round-1 verdict marked "partial" — dedicated entries
# ---------------------------------------------------------------------------


@register(
    "j8_benchmark_3way",
    survey_ids=("J8",),
    oracle=f"""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_lines,
       {money_sum_sql('l.l_extendedprice')} AS gross
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_mktsegment
""",
    doc="The benchmark's 3-way join shape (customer-orders-lineitem, "
    "src/benchmark.py:100-117) as its own entry: two fact-fact "
    "shuffles on the join keys, aggregate after.",
)
def j8_benchmark_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_lines"),
            money_sum(F.col("l_extendedprice")).alias("gross"),
        )
    )


def _uuid_sql(expr: str) -> str:
    return (
        f"substring(md5({expr}), 1, 8) || '-' || "
        f"substring(md5({expr}), 9, 4) || '-' || "
        f"substring(md5({expr}), 13, 4) || '-' || "
        f"substring(md5({expr}), 17, 4) || '-' || "
        f"substring(md5({expr}), 21, 12)"
    )


def _uuid_col(c):
    h = F.md5(c)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


@register(
    "j10_uuid_equi_join",
    survey_ids=("J10",),
    oracle=f"""
WITH a AS (
  SELECT o_orderkey, {_uuid_sql("CAST(o_orderkey AS VARCHAR)")} AS gid
  FROM orders
),
b AS (
  SELECT l_orderkey, l_partkey,
         {_uuid_sql("CAST(l_orderkey AS VARCHAR)")} AS gid
  FROM lineitem WHERE l_linenumber = 1
)
SELECT a.o_orderkey, a.gid, b.l_partkey
FROM a JOIN b ON a.gid = b.gid
""",
    doc="UUID-keyed equi-join (the reference joins on MusicBrainz "
    "gid uuids, sql/2:4,23): 36-char canonical-form string keys — "
    "Spark has no native UUID type, the join hashes the string.",
)
def j10_uuid_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", _uuid_col(F.col("o_orderkey").cast("string")).alias("gid")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(
            "l_partkey",
            _uuid_col(F.col("l_orderkey").cast("string")).alias("gid"),
        )
    )
    return orders.join(li, "gid").select("o_orderkey", "gid", "l_partkey")


@register(
    "a6_keyed_multimap",
    survey_ids=("A6",),
    oracle="""
SELECT o_custkey,
       array_to_string(list_sort(array_agg(DISTINCT o_orderpriority)), ',')
         AS priorities
FROM orders
GROUP BY o_custkey
""",
    doc="Group-to-set keyed multimap (the alias->ids dict build, "
    "src/main.py:90-95): collect_set per key, emitted sorted+joined "
    "for the cross-engine hash.",
)
def a6_keyed_multimap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), ","
            ).alias("priorities")
        )
    )


@register(
    "a7_group_to_list",
    survey_ids=("A7",),
    oracle="""
SELECT o_custkey,
       array_to_string(
         list_transform(
           list_sort(array_agg([CAST(epoch(o_orderdate) AS BIGINT), o_orderkey])),
           x -> CAST(x[2] AS VARCHAR)),
         ',') AS orderkeys_by_date
FROM orders
GROUP BY o_custkey
""",
    doc="Group-to-list preserving a deterministic order (the per-group "
    "candidate lists, src/main.py:227-233): collect_list of "
    "(sortkey, id) structs, sorted, projected to ids.",
)
def a7_group_to_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.array(
                                F.unix_timestamp("o_orderdate").cast("long"),
                                F.col("o_orderkey"),
                            )
                        )
                    ),
                    lambda x: F.element_at(x, 2).cast("string"),
                ),
                ",",
            ).alias("orderkeys_by_date")
        )
    )


@register(
    "f6_unicode_clean",
    survey_ids=("F6",),
    oracle=f"""
SELECT c_custkey,
       {clean_sql("c_name || '…' || '’' || '“' || '”' || '‐'")} AS cleaned
FROM customer
""",
    doc="Unicode punctuation canonicalization (clean(), "
    "src/benchmark.py:14-21) exercised on synthesized non-ASCII "
    "punctuation (the testdata itself is pure ASCII).",
)
def f6_unicode_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.normalize import clean  # noqa: PLC0415

    decorated = F.concat(
        F.col("c_name"), F.lit("…"), F.lit("’"), F.lit("“"), F.lit("”"), F.lit("‐")
    )
    return t(spark, sf_dir, "customer").select(
        "c_custkey", clean(decorated).alias("cleaned")
    )


@register(
    "f8_relevance_generation",
    survey_ids=("F8",),
    oracle=f"""
SELECT p_partkey,
       round(CASE WHEN {search_key_sql('p_name')} = 'coldwidget'
             THEN CAST(p_size AS DOUBLE)
             ELSE p_size / 10.0 END, 2) AS relevance
FROM part
""",
    doc="Relevance v1 (generation path, src/main.py:42-48): exact key "
    "match keeps the score, fuzzy match is worth a tenth.",
)
def f8_relevance_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scoring import relevance_generation  # noqa: PLC0415

    part = t(spark, sf_dir, "part")
    rel = relevance_generation(
        search_key("p_name") == "coldwidget", F.col("p_size")
    )
    return part.select("p_partkey", round2(rel).alias("relevance"))


@register(
    "j_full_outer_reconcile",
    survey_ids=("J3", "F3", "A1"),
    oracle=f"""
WITH by_orders AS (
  SELECT o_custkey AS custkey,
         {money_sum_sql('o_totalprice')} AS order_value
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY o_custkey
), by_balance AS (
  SELECT c_custkey AS custkey, round(c_acctbal, 2) AS acctbal
  FROM customer WHERE c_acctbal > 7500.0
)
SELECT coalesce(o.custkey, b.custkey) AS custkey,
       o.order_value, b.acctbal,
       CASE WHEN o.custkey IS NULL THEN 'balance_only'
            WHEN b.custkey IS NULL THEN 'orders_only'
            ELSE 'both' END AS presence
FROM by_orders o
FULL OUTER JOIN by_balance b ON o.custkey = b.custkey
""",
    doc="FULL OUTER reconciliation — the join shape the rest of the "
    "inventory lacks (J3/J4 cover LEFT): two independently-derived "
    "keyed views of customers are merged with COALESCE'd keys and a "
    "presence tag, the standard two-system reconciliation report. "
    "Physical note: full-outer cannot broadcast either side — it is "
    "always a shuffle join on the key, which is why both inputs are "
    "PRE-AGGREGATED to one row per key before the join.",
)
def j_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7500.0)
    by_orders = orders.groupBy(F.col("o_custkey").alias("o_key")).agg(
        money_sum(F.col("o_totalprice")).alias("order_value")
    )
    by_balance = cust.select(
        F.col("c_custkey").alias("b_key"), F.round("c_acctbal", 2).alias("acctbal")
    )
    joined = by_orders.join(by_balance, F.col("o_key") == F.col("b_key"), "full_outer")
    return joined.select(
        F.coalesce(F.col("o_key"), F.col("b_key")).alias("custkey"),
        "order_value",
        "acctbal",
        F.when(F.col("o_key").isNull(), "balance_only")
        .when(F.col("b_key").isNull(), "orders_only")
        .otherwise("both")
        .alias("presence"),
    )


@register(
    "set_intersect_except",
    survey_ids=("SET1", "A1"),
    oracle="""
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
), y97 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT 'retained' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'churned' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'new' AS cohort, CAST(count(*) AS BIGINT) AS n_customers
FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y96)
""",
    doc="INTERSECT / EXCEPT set algebra — the set operations SET1-SET3 "
    "(union family) leave uncovered: year-over-year customer "
    "retention as retained (intersect), churned (except), new "
    "(reverse except). Spark plans both as aggregate-then-join "
    "(distinct + left-semi/anti) on the key — same shuffle shape as "
    "the J9 semi/anti probes, no extra pass.",
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")

    def actives(y0: str, y1: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= y0) & (F.col("o_orderdate") < y1)
            )
            .select("o_custkey")
            .distinct()
        )

    y96 = actives("1996-01-01", "1997-01-01")
    y97 = actives("1997-01-01", "1998-01-01")

    def tagged(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n_customers")).select(
            F.lit(name).alias("cohort"), "n_customers"
        )

    return (
        tagged("retained", y96.intersect(y97))
        .unionByName(tagged("churned", y96.exceptAll(y97).distinct()))
        .unionByName(tagged("new", y97.exceptAll(y96).distinct()))
    )
