"""Edge-case differential harness for the orders/lineitem-based r6
operators: constructed hostile tables (NULL join keys, NULL dates,
NULL attributes, duplicate change-feed rows, NULL quantities) run each
query's Spark builder against its own DuckDB oracle on the SAME
parquet — the engine pair must agree on every NULL policy, not just on
clean TPC-H rows.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tijdloze_musicbrainz_spark.plans import REGISTRY

EDGE_ORDER_QUERIES = [
    "etl_scd2_dimension_build",  # NULL attr runs, dup (date, key) feed rows
    "j_bloom_prefilter_join",  # NULL probe/build keys must drop identically
    "graph_triangle_count",  # NULL l_partkey joins nothing on either engine
    "s_zorder_layout_locality",  # NULL partkey/suppkey -> NULL code bucket
    "j_skew_salted_join",  # NULL l_partkey under the hot-key CASE
    # r8: NULL-coordinate rows land in the hive DEFAULT partition (one
    # real extra file, never a candidate); NULL keys drop from every
    # CDC change batch identically in both engines
    "s_zorder_write_prune",
    "s7_snapshot_diff_cdf",
]

ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    (1, 10, "O", 100.0, "1995-01-01", "1-URGENT"),
    (2, 10, "O", 110.0, "1995-02-01", "1-URGENT"),  # same attr -> SCD2 collapse
    (3, 10, "F", 120.0, "1995-03-01", "3-MEDIUM"),  # change
    (4, 10, "F", 130.0, "1995-03-01", "3-MEDIUM"),  # same DATE, key tiebreak
    (5, 11, "O", 50.0, "1996-01-01", None),  # NULL attribute run start
    (6, 11, "O", 60.0, "1996-02-01", None),  # NULL != NULL in both engines?
    (7, 12, "O", 70.0, None, "2-HIGH"),  # NULL valid_from date
    (None, 13, "O", 80.0, "1997-01-01", "1-URGENT"),  # NULL key: no bloom entry
    (9, None, "O", 90.0, "1997-02-01", "5-LOW"),  # NULL dimension key
]

LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    (1, 100, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", "1995-01-05"),
    (1, 101, 2, 2, 6.0, 11.0, 0.0, 0.0, "N", "O", "1995-01-05"),
    (1, 102, 3, 3, 7.0, 12.0, 0.0, 0.0, "N", "O", "1995-01-05"),  # triangle
    (2, 100, 1, 1, 8.0, 13.0, 0.0, 0.0, "N", "O", "1995-02-05"),
    (2, 101, 2, 2, 9.0, 14.0, 0.0, 0.0, "N", "O", "1995-02-05"),
    (3, 103, 4, 1, 1.0, 15.0, 0.0, 0.0, "R", "F", "1995-03-05"),
    (None, 100, 1, 1, 2.0, 16.0, 0.0, 0.0, "N", "O", "1995-04-05"),  # NULL okey
    (5, None, 1, 1, 3.0, 17.0, 0.0, 0.0, "N", "O", "1996-01-05"),  # NULL pkey
    (5, 104, None, 1, 4.0, 18.0, 0.0, 0.0, "N", "O", "1996-01-05"),  # NULL skey
    (7, 100, 1, 1, None, 19.0, 0.0, 0.0, "N", "O", None),  # NULL qty + date
]

PART = [
    (1, "hot part one", "B1", "T1", 1, 10.0),
    (100, "part hundred", "B1", "T1", 1, 10.0),
    (101, "part hundred one", "B2", "T2", 2, 11.0),
    (102, "part hundred two", "B2", "T2", 3, 12.0),
    (103, "part hundred three", "B3", "T3", 4, 13.0),
    (None, "null key part", "B9", "T9", 9, 99.0),  # NULL dim key
]


@pytest.fixture(scope="module")
def edge_orders_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_orders")
    spark.createDataFrame(
        ORDERS,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate_s string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate_s AS DATE) AS o_orderdate", "o_orderpriority",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        LINEITEM,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate_s string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "CAST(l_shipdate_s AS DATE) AS l_shipdate",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))
    spark.createDataFrame(
        PART,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size long, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "part.parquet"))
    return str(d)


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


@pytest.mark.parametrize("name", EDGE_ORDER_QUERIES)
def test_edge_orders_matches_oracle(spark, edge_orders_dir, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, edge_orders_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(_canon(r[c]) for c in scols) for r in sdf.collect()], key=repr
    )
    con = duckdb.connect()
    for tname in ("orders", "lineitem", "part"):
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{edge_orders_dir}/{tname}.parquet/*.parquet')"
        )
    rel = con.execute(spec.oracle)
    cols0 = [d[0] for d in rel.description]
    idx = [cols0.index(c) for c in sorted(cols0)]
    drows = sorted(
        [tuple(_canon(r[i]) for i in idx) for r in rel.fetchall()], key=repr
    )
    assert scols == sorted(cols0), (scols, sorted(cols0))
    assert srows == drows, (
        f"{name}: first diffs "
        f"{[(a, b) for a, b in zip(srows, drows) if a != b][:3]}"
    )
