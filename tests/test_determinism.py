"""Partition-count determinism: float-aggregating queries must
produce BIT-IDENTICAL results under different shuffle-partition
counts (3-way local vs 4096-way cluster must hash the same). This is
the property the exact-DECIMAL money aggregation buys; plain double
sums fail it at cent boundaries."""

from __future__ import annotations

import pytest

FLOAT_QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "events_tumbling_window",
    "a_accuracy_report",
    # r5: queries whose THRESHOLD comparisons sit on aggregated floats —
    # the exact-DECIMAL restatements must make the kept-row SET (not
    # just the printed values) partition-count-invariant
    "q8_market_share",
    "q11_important_stock",
    "q17_small_quantity_revenue",
    "events_anomaly_zscore",
    # equality joins/filters on aggregated money values
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "q18_large_volume_customer",
    # r4c: the new operators' determinism claims — in-row interval
    # folds over SORTED position lists (spans/cut), the per-source
    # sorted next-fit (pack), the narrow chunker, the blocked numpy
    # near-dup (per-pair dot order is fixed by the vector layout, not
    # by collect_list row order), and the hash-checked volume job
    "dedup_exact_substring_spans",
    "dedup_exact_substring_cut",
    "corpus_pack_sequences",
    "corpus_chunk_overlap",
    "sim_embedding_near_dup",
    "mb_pipeline_scale",
]


@pytest.mark.parametrize("name", FLOAT_QUERIES)
def test_result_independent_of_partitioning(spark, sf_dir, name):
    from tijdloze_musicbrainz_spark.plans import REGISTRY

    few = spark.newSession()
    few.conf.set("spark.sql.shuffle.partitions", "3")
    many = spark.newSession()
    many.conf.set("spark.sql.shuffle.partitions", "27")

    def rows(session):
        df = REGISTRY[name].builder(session, sf_dir)
        return sorted(tuple(r) for r in df.collect())

    assert rows(few) == rows(many)
