"""Recall checks for the approximate (rows-only) ANN variants
against the exact top-k — the property a hash-compare can't express:
approximation quality."""

from __future__ import annotations


def _topk_pairs(spark, sf_dir, name):
    from tijdloze_musicbrainz_spark.plans import REGISTRY

    return {
        (r["query_id"], r["match_id"])
        for r in REGISTRY[name].builder(spark, sf_dir).collect()
    }


def test_ivf_recall(spark, sf_dir):
    exact = _topk_pairs(spark, sf_dir, "sim_cosine_topk_exact")
    ivf = _topk_pairs(spark, sf_dir, "sim_ann_ivf_bucketed")
    assert len(exact & ivf) / len(exact) >= 0.8


def test_lsh_recall(spark, sf_dir):
    exact = _topk_pairs(spark, sf_dir, "sim_cosine_topk_exact")
    lsh = _topk_pairs(spark, sf_dir, "sim_ann_lsh_bucketed")
    # sign-LSH with 8x4 bands on weakly-clustered vectors: expect most
    # of the true top-k to surface through some shared bucket
    assert len(exact & lsh) / len(exact) >= 0.5
