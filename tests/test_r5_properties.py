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
