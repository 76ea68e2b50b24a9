"""End-to-end tests of the composed MusicBrainz-shaped pipeline
(pipeline.run_pipeline) over the FIXTURES.md §B-shaped fixture world
(tijdloze_musicbrainz_spark.fixtures). The scenarios are the
reference's own documented counterexamples (README.md:39-41) driven
through the FULL DAG — area resolution → artist cut → aliases →
candidate pools → canonical selection → song aliases — not just the
sort key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tijdloze_musicbrainz_spark.fixtures import musicbrainz_fixture_tables
from tijdloze_musicbrainz_spark.pipeline import run_pipeline, song_aliases


@pytest.fixture(scope="module")
def outputs(spark):
    t = musicbrainz_fixture_tables(spark)
    return run_pipeline(t), t


def _winners(outputs):
    best = outputs[0]["canonical"]
    return {r["recording_mb_id"]: r for r in best.collect()}


def test_artist_cut(outputs):
    rows = {r["id"]: r for r in outputs[0]["mb_artist"].collect()}
    assert set(rows) == {10, 11}
    assert rows[10]["country_id"] == "be"  # via depth-1 part-of chain
    assert rows[11]["country_id"] == "nl"  # via depth-2 chain
    assert rows[11]["score"] == 9


def test_artist_aliases_include_legal_name(outputs):
    al = outputs[0]["mb_artist_alias"]
    got = {(r["artist_id"], r["alias"]) for r in al.collect()}
    assert (10, "gorki") in got
    assert (10, "gorky") in got
    assert (10, "lucdevos") in got  # via legal-name link 103/1094
    assert (11, "nirvana") in got
    # excluded artists contribute nothing
    assert not any(a in (12, 13) for a, _ in got)


def test_single_one_year_early_loses_to_album_e2e(outputs):
    w = _winners(outputs)
    assert w["r200"]["release_group_mb_id"] == "rg101"  # album, not single


def test_single_two_years_early_wins_e2e(outputs):
    w = _winners(outputs)
    assert w["r201"]["release_group_mb_id"] == "rg102"  # single wins
    # and the bootleg 1990 year of Album Two was ignored
    assert w["r201"]["release_year"] == 1990


def test_single_from_beats_plain_compilation_e2e(outputs):
    w = _winners(outputs)
    assert w["r202"]["release_group_mb_id"] == "rg106"
    assert w["r202"]["is_single_from"] is True


def test_soundtrack_pool_and_second_artist(outputs):
    w = _winners(outputs)
    # Song D only exists on a VA soundtrack: normal pool can't see it
    # (rg credit != recording artist), the soundtrack pool must.
    assert w["r203"]["release_group_mb_id"] == "rg107"
    assert w["r203"]["is_soundtrack"] is True
    assert w["r203"]["second_artist_id"] == 10  # duet credit position 1


def test_null_year_entries_dropped(outputs):
    w = _winners(outputs)
    assert "r204" not in w


def test_work_link_order_guard(outputs):
    w = _winners(outputs)
    assert w["r200"]["work_mb_id"] == "w300"  # link_order<=1 edge only


def test_recording_score_counts_all_releases(outputs):
    w = _winners(outputs)
    # Song B appears on 3 tracks incl. the bootleg: score counts all
    assert w["r201"]["recording_score"] == 3


def test_song_aliases_four_branches(outputs):
    out, t = outputs
    aliases = song_aliases(
        out["mb_song"].withColumn("id", F.col("mb_id")),
        t["recording"],
        t["recording_alias"],
        t["l_recording_work"],
        t["work"],
        t["work_alias"],
    )
    got = {(r["song_id"], r["alias"]) for r in aliases.collect()}
    # Song A: own name + "(live)" alias fold to one key; work name and
    # accented work alias contribute two more
    assert ("r200", "songa") in got
    assert ("r200", "worka") in got
    assert ("r200", "werka") in got
    # the link_order>1 work ("Ignored Work") is still an alias source
    # in sql/5 (no link_order filter there)
    assert ("r200", "ignoredwork") in got


def test_language_pick(outputs):
    w = _winners(outputs)
    # Song A's work has English (usable via iso_code_1)
    assert w["r200"]["language"] == "en"
    # recordings without a usable work language get NULL
    assert w["r201"]["language"] is None


def test_scale_pipeline_smoke(spark, sf_dir):
    from tijdloze_musicbrainz_spark.plans.mb_pipeline import mb_pipeline_scale

    best = mb_pipeline_scale(spark, sf_dir)
    n = best.count()
    assert n > 0
    # one winner per (artist, recording)
    assert (
        best.groupBy("artist_id", "recording_mb_id").count().filter("count > 1").count()
        == 0
    )


def test_album_export_uses_group_year_not_official_year(outputs):
    # Album One wins Song A via official 1991, but the group has a
    # 1985 bootleg: mb_album.release_year is the group-wide min
    # (no status filter), while the canonical pick still keys off the
    # official-only year.
    w = _winners(outputs)
    assert w["r200"]["release_group_mb_id"] == "rg101"
    assert w["r200"]["release_year"] == 1991
    albums = {r["mb_id"]: r for r in outputs[0]["mb_album"].collect()}
    assert albums["rg101"]["release_year"] == 1985


def test_song_export_is_single_is_the_single_from_flag(outputs):
    songs = {r["mb_id"]: r for r in outputs[0]["mb_song"].collect()}
    assert songs["r202"]["is_single"] is True  # single-from-flagged winner
    assert songs["r200"]["is_single"] is False  # plain album winner
