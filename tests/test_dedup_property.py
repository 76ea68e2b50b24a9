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
