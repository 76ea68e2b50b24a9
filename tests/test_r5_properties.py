"""Semantic invariants of the round-5 analytics tier — properties the
differential oracle can't see (it proves Spark == DuckDB, not that the
shared semantics are sane). Each test pins an inequality that must
hold for ANY input, so a future refactor that keeps both engines in
lock-step but breaks the meaning still goes red."""

from __future__ import annotations


def _rows(spark, sf_dir, name):
    from tijdloze_musicbrainz_spark.plans import REGISTRY

    return REGISTRY[name].builder(spark, sf_dir).collect()


def test_funnel_steps_monotone(spark, sf_dir):
    (r,) = _rows(spark, sf_dir, "events_funnel_conversion")
    assert r.users_viewed >= r.users_clicked >= r.users_purchased >= 0
    assert 0.0 <= r.view_to_purchase <= r.view_to_click <= 1.0


def test_retention_cohort_accounting(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_retention_cohort")
    assert all(r.week_offset >= 0 for r in rows)
    total_events = sum(r.n_events for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert total_events == ev.count()
    # offset-0 cell of each cohort contains each user's first event
    assert any(r.week_offset == 0 for r in rows)


def test_mixture_plan_within_budget(spark, sf_dir):
    rows = _rows(spark, sf_dir, "corpus_mixture_plan")
    assert rows
    for r in rows:
        assert 0.0 < r.sample_rate <= 1.0
        assert r.tokens_planned <= r.tokens_available
    # per group, the planned total never exceeds the budget
    by_grp: dict[str, list] = {}
    for r in rows:
        by_grp.setdefault(r.grp, []).append(r)
    for grp, rs in by_grp.items():
        assert sum(r.tokens_planned for r in rs) <= rs[0].group_budget, grp


def test_scorecard_rates_bounded(spark, sf_dir):
    rows = _rows(spark, sf_dir, "corpus_curation_scorecard")
    assert rows
    for r in rows:
        for rate in (
            r.quality_pass_rate,
            r.exact_dup_rate,
            r.denylist_hit_rate,
            r.mean_dup_word_ratio,
        ):
            assert 0.0 <= rate <= 1.0, r
        assert r.mean_tokens > 0


def test_lm_scores_are_log_probs(spark, sf_dir):
    rows = _rows(spark, sf_dir, "text_bigram_lm_score")
    assert rows
    assert all(r.lm_score < 0 for r in rows)  # log of p<1
    assert all(r.n_bigrams > 0 for r in rows)


def test_upsample_multiplies_exactly(spark, sf_dir):
    from tijdloze_musicbrainz_spark.plans.textops import UPSAMPLE_EPOCHS

    rows = _rows(spark, sf_dir, "corpus_domain_upsample")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    by_source = {
        r.source: r for r in rows
    }
    for source, base in counts.items():
        r = by_source[source]
        epochs = UPSAMPLE_EPOCHS.get(source, 1)
        assert r.n_epochs == epochs
        assert r.n_rows_out == base * epochs


def test_retention_first_week_has_all_users(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_retention_cohort")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    week0_users = sum(r.n_users for r in rows if r.week_offset == 0)
    # every user's first event lands in their own offset-0 bucket
    assert week0_users >= n_users


def test_pii_masking_removes_every_match(spark):
    """Adversarial PII corpus: after the three-stage mask, NO email /
    phone / IPv4 pattern may survive anywhere in the text — including
    at string edges, back-to-back, and inside host-like tokens."""
    from pyspark.sql import functions as F

    from tijdloze_musicbrainz_spark.plans.curation import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
    )

    adversarial = [
        "a.b-c_d%e+f@sub.domain.example.co contact me",
        "edge@case.io",
        "two emails x@y.zz and a@b.cc in one line",
        "phone 555-123-4567 then 555-000-1111",
        "ip 10.0.0.1 and 255.255.255.255 and 1.2.3.4",
        "email-with-ip-host user@10.0.0.1.example.com ok",
        "555-123-4567@not-a-phone.example.org",
        "not5-123-4567 a555-123-45678 (no match inside longer runs)",
        "mixed: a@b.cc 1.2.3.4 555-111-2222 a@b.cc",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(adversarial)], "id long, text string")
    masked = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
                PII_PHONE,
                "<PHONE>",
            ),
            PII_IPV4,
            "<IP>",
        ).alias("m")
    )
    leftovers = masked.select(
        (
            F.regexp_count("m", F.lit(PII_EMAIL))
            + F.regexp_count("m", F.lit(PII_PHONE))
            + F.regexp_count("m", F.lit(PII_IPV4))
        ).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert leftovers == 0


def test_semdedup_every_cluster_keeps_one(spark, sf_dir):
    rows = _rows(spark, sf_dir, "dedup_semantic_semdedup")
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    # within every cluster the smallest vec_id can never be marked
    # duplicate (first-writer-wins), so each cluster keeps >= 1 member
    for members in by_cluster.values():
        smallest = min(members, key=lambda r: r.vec_id)
        assert smallest.is_dup is False
        assert any(not r.is_dup for r in members)
    # every vector appears exactly once (assignment is total + unique)
    assert len(rows) == len({r.vec_id for r in rows})


def test_exact_substring_k50_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "dedup_exact_substring_spans_k50")
    for r in rows:
        assert 0 <= r.dup_tokens <= r.n_tok
        assert r.n_spans <= r.n_dup_grams
        if r.n_tok > 0:
            assert 0.0 <= r.dup_frac <= 1.0
        # a duplicated span needs >= 50 tokens of coverage per span
        if r.n_spans > 0:
            assert r.dup_tokens >= 50


def test_tight_near_dup_subset_of_brute(spark, sf_dir):
    # every tight-threshold LSH pair must be a TRUE >= 0.92 pair
    # (verify-after-bucket guarantees precision 1.0; recall is the
    # approximate part) — and must also appear in the 0.45 brute set
    tight = {
        (r.vec_a, r.vec_b): r.cosine
        for r in _rows(spark, sf_dir, "sim_near_dup_lsh_tight")
    }
    assert all(c >= 0.92 for c in tight.values())
    brute = {
        (r.vec_a, r.vec_b) for r in _rows(spark, sf_dir, "sim_embedding_near_dup")
    }
    assert set(tight) <= brute
