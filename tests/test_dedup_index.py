"""Incremental MinHash index (plans/dedup_index.py): the probe must
read the stored band index bucket-aligned (no index shuffle), and the
incremental answer must equal the batch operator's answer restricted
to arriving-endpoint pairs — the lifecycle adds ingest mechanics, not
different semantics.
"""

from __future__ import annotations

import contextlib
import io

from tijdloze_musicbrainz_spark.plans import REGISTRY
from tijdloze_musicbrainz_spark.plans.dedup_index import DEDUP_DELTA_MOD


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_probe_reads_stored_index_bucketed(spark, sf_dir):
    df = REGISTRY["dedup_minhash_incremental"].builder(spark, sf_dir)
    plan = _plan(df)
    # the stored band table arrives bucket-aligned: its scan is marked
    # bucketed and the probe join is the sort-merge the hint pins (a
    # toy-scale broadcast would hide the property under test)
    assert "Bucketed: true" in plan
    assert "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_equals_batch_restricted_to_arrivals(spark, sf_dir):
    inc = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in REGISTRY["dedup_minhash_incremental"]
        .builder(spark, sf_dir)
        .collect()
    }
    batch = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in REGISTRY["dedup_minhash_lsh"].builder(spark, sf_dir).collect()
    }
    expected = {
        (a, b, j)
        for (a, b, j) in batch
        if a % DEDUP_DELTA_MOD == 0 or b % DEDUP_DELTA_MOD == 0
    }
    assert inc == expected
    assert inc, "restriction produced no pairs — split constant broke the test"


def test_n_indexed_counts_every_nonnull_doc(spark, sf_dir):
    import pyspark.sql.functions as F

    from tijdloze_musicbrainz_spark.plans.util import t

    rows = (
        REGISTRY["dedup_minhash_incremental"]
        .builder(spark, sf_dir)
        .select("n_indexed")
        .distinct()
        .collect()
    )
    assert len(rows) == 1
    n_docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .count()
    )
    # base indexed at build + delta appended = every non-null doc: the
    # accounting column proves the append landed in the queried store
    assert rows[0]["n_indexed"] == n_docs
