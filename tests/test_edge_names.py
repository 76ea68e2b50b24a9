"""Edge-case differential harness for the fuzzy / normalization tier:
hostile NAME columns — empty, whitespace-only, punctuation-only
(search_key folds to ''), accented unicode, '&'-duets, digits-only,
very long — through the search-key and fuzzy-matching queries, each
checked against its own DuckDB oracle on the same parquet."""

from __future__ import annotations

import math

import duckdb
import pytest

from tijdloze_musicbrainz_spark.plans import REGISTRY

EDGE_NAME_QUERIES = [
    "f_search_key_normalization",
    "f6_unicode_clean",
    "f12_ci_startswith",
    "p12_exact_key_match",
    "p_levenshtein_bounded",
    "fuzzy_artist_resolve",
    "fuzzy_duet_split_resolve",
    "fuzzy_two_phase_search",
    "set_union_distinct_aliases",
]

HOSTILE_NAMES = [
    "",
    "   ",
    "!!!",
    "Beyoncé",
    "Motörhead & Lemmy",
    "ÆØÅ æøå",
    "12345",
    "x" * 200,
    "The Beatles",
    "the beatles",  # case-folds onto the previous
]


@pytest.fixture(scope="module")
def edge_names_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_names")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR, "
        "s_nationkey INTEGER, s_acctbal DOUBLE)"
    )
    con.execute(
        "CREATE TABLE part (p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, "
        "p_type VARCHAR, p_size INTEGER, p_retailprice DOUBLE)"
    )
    con.execute(
        "CREATE TABLE lineitem (l_orderkey BIGINT, l_partkey BIGINT, "
        "l_suppkey BIGINT, l_linenumber INTEGER, l_quantity DOUBLE, "
        "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)"
    )
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority VARCHAR)"
    )
    con.execute(
        "CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR, "
        "c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR)"
    )
    con.execute("CREATE TABLE nation AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/nation.parquet')")
    con.execute("CREATE TABLE region AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/region.parquet')")
    for i, name in enumerate(HOSTILE_NAMES):
        # suppkeys multiples of 10: several queries filter % 10 == 0
        con.execute(
            "INSERT INTO supplier VALUES (?, ?, ?, ?)",
            (i * 10, name, i % 5, 100.0 + i),
        )
        con.execute(
            "INSERT INTO part VALUES (?, ?, ?, ?, ?, ?)",
            (i, name, f"Brand#{i % 3}", "STANDARD", i + 1, 900.0 + i),
        )
    n = len(HOSTILE_NAMES)
    for i in range(n):
        for j in range(2):  # two lineitems per part, rotating suppliers
            con.execute(
                "INSERT INTO lineitem VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                (
                    i * 2 + j,
                    i,
                    ((i + j) % n) * 10,
                    j + 1,
                    5.0,
                    100.0,
                    0.05,
                    0.02,
                    "R" if j == 0 else "N",
                    "O",
                    "2024-03-01 00:00:00",
                ),
            )
        con.execute(
            "INSERT INTO orders VALUES (?, ?, ?, ?, ?, ?)",
            (i * 2, i, "O", 1000.0, "2024-03-01 00:00:00", "1-URGENT"),
        )
        con.execute(
            "INSERT INTO customer VALUES (?, ?, ?, ?, ?)",
            (i, HOSTILE_NAMES[i], i % 5, 50.0 + i, "BUILDING"),
        )
    for t in ("supplier", "part", "lineitem", "orders", "customer", "nation", "region"):
        con.execute(f"COPY {t} TO '{d}/{t}.parquet' (FORMAT parquet)")
    return str(d)


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


@pytest.mark.parametrize("name", EDGE_NAME_QUERIES)
def test_edge_names_matches_oracle(spark, edge_names_dir, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, edge_names_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(_canon(r[c]) for c in scols) for r in sdf.collect()], key=repr
    )
    con = duckdb.connect()
    for t in ("supplier", "part", "lineitem", "orders", "customer", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_names_dir}/{t}.parquet')"
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
