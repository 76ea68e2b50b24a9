"""Hypothesis-driven differential fuzz for the dedup tier: random
small corpora from a tiny alphabet (maximal repetition pressure) run
through the Spark builders AND their DuckDB oracles. The fixed edge
fixtures pin known hostile classes; this hunts the unknown ones —
interval-union off-by-ones, gram-boundary conditions, BPE overlap
parity, cluster-label ties — on corpora neither fixture anticipated.

Budgets are deliberately small (each example runs real Spark jobs):
5 examples x 4 queries ~ 1 min.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tijdloze_musicbrainz_spark.plans import REGISTRY

QUERIES = [
    "dedup_exact_substring_spans",
    "dedup_exact_substring_cut",
    "dedup_cluster_components",
    "text_bpe_train_merges",
]

# tiny alphabet -> dense repetition, adjacent-duplicate tokens, shared
# grams across random docs
_WORD = st.sampled_from(["a", "b", "ab", "ba", "aa"])
_DOC = st.lists(_WORD, min_size=0, max_size=30).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=12)


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


@pytest.fixture(scope="module")
def run_differential(spark, tmp_path_factory):
    counter = {"n": 0}

    def run(docs: list[str]) -> None:
        counter["n"] += 1
        d = tmp_path_factory.mktemp(f"fuzz{counter['n']}")
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
            "source VARCHAR, n_chars BIGINT)"
        )
        con.executemany(
            "INSERT INTO t VALUES (?, ?, 'en', 'srcA', ?)",
            [(i, t, len(t)) for i, t in enumerate(docs)],
        )
        con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT parquet)")
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        for name in QUERIES:
            spec = REGISTRY[name]
            sdf = spec.builder(spark, str(d))
            scols = sorted(sdf.columns)
            srows = sorted(
                [tuple(_canon(r[c]) for c in scols) for r in sdf.collect()],
                key=repr,
            )
            rel = con.execute(spec.oracle)
            cols0 = [x[0] for x in rel.description]
            idx = [cols0.index(c) for c in sorted(cols0)]
            drows = sorted(
                [tuple(_canon(r[i]) for i in idx) for r in rel.fetchall()],
                key=repr,
            )
            assert srows == drows, (
                f"{name} diverged on corpus {docs!r}: "
                f"{[(a, b) for a, b in zip(srows, drows) if a != b][:3]}"
            )

    return run


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_CORPUS)
def test_dedup_tier_matches_oracle_on_random_corpora(run_differential, docs):
    run_differential(docs)


def test_prefix_filter_equals_brute_force_jaccard(spark, tmp_path_factory):
    """The AllPairs recall=1 claim from first principles: on a crafted
    corpus with known near-dupes, the prefix-filtered join must return
    EXACTLY the brute-force all-pairs Jaccard >= 3/5 result — the
    prefix is a pigeonhole argument, not a heuristic, so no pair may
    be lost (and the length/threshold filters may admit none extra)."""
    import itertools

    from pyspark.sql import functions as F

    from tijdloze_musicbrainz_spark.plans import REGISTRY

    docs = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta zeta"),        # J=4/6 vs 0
        (2, "alpha beta gamma delta epsilon"),     # J=1 vs 0
        (3, "one two three four five six"),
        (4, "one two three four five seven"),      # J=5/7 vs 3
        (5, "totally different words here now"),
        (6, "alpha beta"),                         # short: J vs 0 = 2/5
        (7, "gamma delta epsilon"),                # J vs 0 = 3/5 boundary
        (8, ""),                                   # empty text
    ]
    base = tmp_path_factory.mktemp("ppjoin")
    spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("src0")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(f"{base}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in REGISTRY["dedup_jaccard_prefix_filter"]
        .builder(spark, str(base))
        .collect()
    }

    def toks(s):
        return {w for w in s.split(" ") if w}

    want = set()
    for (i, a), (j, b) in itertools.combinations(docs, 2):
        ta, tb = toks(a), toks(b)
        if not ta or not tb:
            continue
        jac = len(ta & tb) / len(ta | tb)
        if jac >= 3 / 5:
            want.add((i, j, round(jac, 6)))
    assert want, "crafted corpus must contain qualifying pairs"
    assert got == want


def test_containment_equals_brute_force(spark, tmp_path_factory):
    """One-sided prefix filtering must return EXACTLY the brute-force
    containment result (|A inter B| >= 4/5 |A|), including the
    asymmetric pair (tweet inside article) that symmetric Jaccard
    misses, and both directions of an exact-duplicate pair."""
    import itertools

    from pyspark.sql import functions as F

    from tijdloze_musicbrainz_spark.plans import REGISTRY

    docs = [
        (0, "quick brown fox jumps high"),
        (1, "quick brown fox jumps high over the extremely lazy sleepy "
            "old guard dog tonight"),          # contains 0 fully
        (2, "quick brown fox jumps"),           # 4 tokens, all in 0: c=1
        (3, "totally unrelated words appear here"),
        (4, "quick brown fox jumps high"),      # exact dup of 0
        (5, "quick brown cat naps low"),        # 2/5 of 0: below
        (6, ""),
    ]
    base = tmp_path_factory.mktemp("containment")
    spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("src0")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(f"{base}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b, r.containment)
        for r in REGISTRY["dedup_containment_join"]
        .builder(spark, str(base))
        .collect()
    }

    def toks(s):
        return {w for w in s.split(" ") if w}

    want = set()
    for (i, a), (j, b) in itertools.permutations(docs, 2):
        ta, tb = toks(a), toks(b)
        if not ta or not tb:
            continue
        c = len(ta & tb) / len(ta)
        if c >= 4 / 5:
            want.add((i, j, round(c, 6)))
    assert (0, 1, 1.0) in want, "sanity: the quote-inclusion pair"
    assert (0, 4, 1.0) in want and (4, 0, 1.0) in want, "both dup directions"
    assert got == want


def _exhaustive_jaccard_sql() -> str:
    from tijdloze_musicbrainz_spark.plans.dedup import _SHINGLES_SQL

    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (SELECT doc_id, {_SHINGLES_SQL} AS sgs FROM w)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.sgs, b.sgs)) * 1.0
             / len(list_distinct(list_concat(a.sgs, b.sgs))), 4) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sgs, b.sgs)) * 1.0
      / len(list_distinct(list_concat(a.sgs, b.sgs))) >= 0.8
"""


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_prefix_filtered_oracle_equals_exhaustive_pair_scan(sf):
    """r11 verdict item 2: the sf0.1 sweep skips existed because the
    all-pairs Jaccard oracle was the exhaustive O(n^2) pair scan. The
    replacement states the SAME exact result via prefix filtering
    (rare-shingles-first global order; a qualifying pair must share a
    prefix shingle — Chaudhuri ICDE'06 / PPJoin). Pin set-equality of
    the two formulations on the real corpora (DuckDB only, no
    Spark)."""
    from tijdloze_musicbrainz_spark.plans.dedup import (
        _JACCARD_ALLPAIRS_ORACLE,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'/root/testdata/{sf}/documents.parquet'"
    )
    new = sorted(map(tuple, con.execute(_JACCARD_ALLPAIRS_ORACLE).fetchall()))
    old = sorted(map(tuple, con.execute(_exhaustive_jaccard_sql()).fetchall()))
    assert new == old
    assert new, "no qualifying pairs — corpus no longer plants near-dups"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abc"), min_size=0, max_size=12
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=25,
    )
)
def test_prefix_filtered_oracle_equals_exhaustive_on_random_corpora(docs):
    """Differential fuzz for the prefix-filter equivalence itself:
    tiny-alphabet corpora maximize shingle collisions, duplicate docs,
    empty docs, and sub-3-token docs — the boundary cases where a
    wrong prefix length would silently drop a qualifying pair. Pure
    DuckDB, no Spark jobs."""
    from tijdloze_musicbrainz_spark.plans.dedup import (
        _JACCARD_ALLPAIRS_ORACLE,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE docs_raw (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs_raw VALUES (?, ?)", list(enumerate(docs))
    )
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_raw")
    new = sorted(map(tuple, con.execute(_JACCARD_ALLPAIRS_ORACLE).fetchall()))
    old = sorted(map(tuple, con.execute(_exhaustive_jaccard_sql()).fetchall()))
    assert new == old


def _exhaustive_containment_sql() -> str:
    from tijdloze_musicbrainz_spark.plans.dedup import CONT_DEN, CONT_NUM

    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.tk AS tk
  FROM documents,
       unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS t(tk)
),
lens AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
pairs AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM tok x JOIN tok y ON x.tk = y.tk AND x.doc_id <> y.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       round(CAST(p.n_common AS DOUBLE) / l.len, 6) AS containment
FROM pairs p JOIN lens l ON l.doc_id = p.doc_a
WHERE {CONT_DEN} * p.n_common >= {CONT_NUM} * l.len
"""


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_containment_oracle_equals_exhaustive(sf):
    """The containment oracle's two exact accelerations (positional
    filter at the earliest shared prefix token + sorted-int-list
    intersection verify) must return exactly the brute-force
    token-join result."""
    from tijdloze_musicbrainz_spark.plans import REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'/root/testdata/{sf}/documents.parquet'"
    )
    fast = sorted(
        map(
            tuple,
            con.execute(REGISTRY["dedup_containment_join"].oracle).fetchall(),
        )
    )
    brute = sorted(
        map(tuple, con.execute(_exhaustive_containment_sql()).fetchall())
    )
    assert fast == brute
    assert fast, "no containment pairs — corpus no longer plants them"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcd"), min_size=0, max_size=10
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=25,
    )
)
def test_containment_oracle_equals_exhaustive_on_random_corpora(docs):
    """Fuzz the positional-filter bound itself: tiny-alphabet corpora
    produce extreme token sharing, empty docs, and len-1 docs — where
    a wrong prefix length or an off-by-one in the 1 + min(...) bound
    would silently drop a qualifying pair."""
    from tijdloze_musicbrainz_spark.plans import REGISTRY

    con = duckdb.connect()
    con.execute("CREATE TABLE docs_raw (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs_raw VALUES (?, ?)", list(enumerate(docs))
    )
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_raw")
    fast = sorted(
        map(
            tuple,
            con.execute(REGISTRY["dedup_containment_join"].oracle).fetchall(),
        )
    )
    brute = sorted(
        map(tuple, con.execute(_exhaustive_containment_sql()).fetchall())
    )
    assert fast == brute
