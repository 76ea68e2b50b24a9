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
    assert len(exact & ivf) / len(exact) >= 0.9


def test_lsh_recall(spark, sf_dir):
    exact = _topk_pairs(spark, sf_dir, "sim_cosine_topk_exact")
    lsh = _topk_pairs(spark, sf_dir, "sim_ann_lsh_bucketed")
    # 24x4 sign-LSH bands: measured recall@5 is 0.96 at sf0.001/0.01
    # and 0.99 at sf0.1 (bench.py re-measures and emits it per round)
    assert len(exact & lsh) / len(exact) >= 0.9
