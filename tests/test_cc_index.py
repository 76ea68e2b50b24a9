"""Incremental cluster lifecycle (plans/cc_index.py): the probe must
read the stored block index bucket-aligned (no index shuffle), the
merge must run on the contracted graph, and the incremental labels
must be bit-identical to a from-scratch batch clustering — including
the relabel cascade when an arriving document bridges two existing
components.
"""

from __future__ import annotations

import contextlib
import io

from tijdloze_musicbrainz_spark.plans import REGISTRY
from tijdloze_musicbrainz_spark.plans.cc_index import (
    CC_DELTA_MOD,
    _build_and_ingest,
    _probe_pairs,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_probe_reads_stored_blocks_bucketed(spark, sf_dir):
    t_blocks, paths, _ = _build_and_ingest(spark, sf_dir, "cc_plan_probe")
    plan = _plan(_probe_pairs(spark, t_blocks, paths))
    assert "Bucketed: true" in plan
    assert "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_labels_equal_batch_clustering(spark, sf_dir):
    inc = {
        r["doc_id"]: r["cluster_id"]
        for r in REGISTRY["dedup_cluster_incremental"]
        .builder(spark, sf_dir)
        .collect()
    }
    batch = {
        r["doc_id"]: r["cluster_id"]
        for r in REGISTRY["dedup_cluster_components"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert inc == batch
    assert any(k != v for k, v in inc.items()), (
        "corpus produced no non-trivial clusters — test is vacuous"
    )


def test_relabel_cascade_when_delta_bridges_two_components(spark, tmp_path):
    """Crafted corpus: base components {1,2} (label 1) and {3,4}
    (label 3) are NOT near-dups of each other (J ~ 0.82 < 0.9), but
    the arriving doc 10 is >= 0.9-near one member of EACH — the merge
    must cascade the relabel so all five documents land in cluster 1,
    even though doc 3/4 were never compared against doc 1/2."""
    import duckdb

    toks = [f"t{i}" for i in range(1, 63)]  # 62 tokens, 60 shingles

    def variant(*changes: tuple[int, str]) -> str:
        ws = list(toks)
        for pos, w in changes:
            ws[pos - 1] = w
        return " ".join(ws)

    rows = [
        # comp A: 2 = T<30>, 1 = T<30, last>  (J(1,2) = 59/61 ~ 0.97)
        (1, variant((30, "qa"), (62, "qz1"))),
        (2, variant((30, "qa"))),
        # comp B: 3 = T<40>, 4 = T<40, last>
        (3, variant((40, "qb"))),
        (4, variant((40, "qb"), (62, "qz4"))),
        # bridge: 10 = T exactly; J(10,2) = J(10,3) = 57/63 ~ 0.905,
        # J(2,3) = 54/66 ~ 0.82 (never pairs directly)
        (10, variant()),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO d VALUES (?, ?, 'en', 's0', ?)",
        [(i, txt, len(txt)) for i, txt in rows],
    )
    con.execute(f"COPY d TO '{tmp_path}/documents.parquet' (FORMAT parquet)")
    assert all(i % CC_DELTA_MOD != 0 for i, _ in rows[:4])
    assert rows[4][0] % CC_DELTA_MOD == 0

    out = {
        r["doc_id"]: (r["cluster_id"], r["n_indexed"])
        for r in REGISTRY["dedup_cluster_incremental"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert out == {i: (1, 5) for i in (1, 2, 3, 4, 10)}
