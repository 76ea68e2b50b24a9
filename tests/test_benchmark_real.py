"""Closed-loop accuracy pins for the REAL golden-CSV benchmark run
(plans/benchmark_real.py, r6 VERDICT item 1).

The scoreboard and the per-class guarantees are pinned as constants:
every designed-Wrong row (impostor catalog entry) must score Wrong,
every designed-Missing row (garbled query) must score Missing, the
only other non-Correct rows are the 44 empty-mbid rows (a match
without a release-group id counts as no match, benchmark.py:245) and
four real-data ambiguities — duplicate (artist, title) pairs and the
"(live)"-key collision that the reference's own search_key semantics
produce (util.py:14-16 strips "(live)", so 'Sunday Bloody Sunday
(live)' keys identically to the studio row and the earlier year
wins).
"""

from __future__ import annotations

import csv
import os

import pytest

from tijdloze_musicbrainz_spark.plans.benchmark_real import (
    MISSING_MOD,
    N_GOLDEN,
    REAL_CSV,
    WRONG_MOD,
    _classified,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REAL_CSV), reason="reference CSV not present"
)

# Pinned scoreboard of the full 2,954-row run (deterministic: fixed
# CSV, deterministic perturbation classes, total-order ranking).
EXPECTED = {"Correct": 2690, "Missing": 167, "Wrong": 97}

# Real-data ambiguities that legitimately score Wrong outside the
# designed class: duplicate (artist, title) rows where the earlier
# release year wins (1664 = the Johnny Cash 'Jackson' duplicate) and
# the U2 "(live)" search-key collision (512).
KNOWN_AMBIGUOUS_WRONG = {185, 288, 512, 1664}


@pytest.fixture(scope="module")
def classified(spark):
    return {r.qid: r.status for r in _classified(spark).collect()}


def _empty_mbid_ids():
    with open(REAL_CSV, encoding="utf-8-sig", newline="") as f:
        return {
            int(row["id"])
            for row in csv.DictReader(f)
            if row["musicbrainz_id"] == ""
        }


def test_scoreboard_pinned(classified):
    counts = {}
    for s in classified.values():
        counts[s] = counts.get(s, 0) + 1
    assert counts == EXPECTED
    assert len(classified) == N_GOLDEN


def test_every_designed_wrong_row_is_wrong(classified):
    designed = {q for q in classified if q % WRONG_MOD == 0}
    assert designed  # 93 rows
    assert all(classified[q] == "Wrong" for q in designed)


def test_every_designed_missing_row_is_missing(classified):
    designed = {
        q for q in classified if q % MISSING_MOD == 0 and q % WRONG_MOD != 0
    }
    assert designed  # 123 rows
    assert all(classified[q] == "Missing" for q in designed)


def test_stray_missing_rows_are_exactly_the_empty_mbid_rows(classified):
    stray = {
        q
        for q, s in classified.items()
        if s == "Missing" and q % WRONG_MOD != 0 and q % MISSING_MOD != 0
    }
    expected = {
        q
        for q in _empty_mbid_ids()
        if q % WRONG_MOD != 0 and q % MISSING_MOD != 0
    }
    assert stray == expected
    assert len(stray) == 44


def test_stray_wrong_rows_are_the_known_ambiguities(classified):
    stray = {
        q for q, s in classified.items() if s == "Wrong" and q % WRONG_MOD != 0
    }
    assert stray == KNOWN_AMBIGUOUS_WRONG
