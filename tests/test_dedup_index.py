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


def test_compaction_collapses_files_preserving_results(spark, sf_dir):
    import os
    import re
    from collections import Counter

    from tijdloze_musicbrainz_spark.plans.dedup_index import (
        DEDUP_INDEX_BUCKETS,
    )
    from tijdloze_musicbrainz_spark.plans.etl import SINK_ROOT

    inc = {
        tuple(r)
        for r in REGISTRY["dedup_minhash_incremental"]
        .builder(spark, sf_dir)
        .collect()
    }
    comp = {
        tuple(r)
        for r in REGISTRY["dedup_minhash_index_compact"]
        .builder(spark, sf_dir)
        .collect()
    }
    # the layout changes, the results must not
    assert comp == inc

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    loc = f"{SINK_ROOT}/mh_compact_bands_{tag}"

    def layout(path):
        fs = [f for f in os.listdir(path) if f.endswith(".parquet")]
        per_bucket = Counter(
            re.search(r"_(\d{5})\.", f).group(1) for f in fs
        )
        return len(fs), max(per_bucket.values())

    n_before, _ = layout(loc)
    n_after, max_per_bucket = layout(f"{loc}_c")
    # base write + append leave 2+ files per touched bucket; the
    # compactor must emit exactly one file per bucket
    assert n_before > DEDUP_INDEX_BUCKETS
    assert n_after <= DEDUP_INDEX_BUCKETS
    assert max_per_bucket == 1


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
