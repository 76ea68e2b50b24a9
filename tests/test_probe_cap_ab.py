"""The probe-pushdown cap is a measured, committed decision (r14
verdict item 5): PROBE_PUSHDOWN_MAX_IN is a conf
(SPARK_GRAFT_PROBE_MAX_IN) whose default is pinned by the A/B curve
tools/probe_cap_ab.py commits as PROBE_CAP_AB.json — In(k) scan cost
vs the unfiltered bucketed scan at TWO corpus shapes (1x and 4x the
sf0.1 documents corpus). These tests read the committed artifact (no
re-measurement — timing tests flake; the tool is the re-measure
path) and pin that the curve actually supports the shipped default."""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ARTIFACT = os.path.join(HERE, "..", "PROBE_CAP_AB.json")


def _load():
    with open(ARTIFACT) as f:
        return json.load(f)


def test_ab_artifact_has_two_shapes_and_matches_shipped_default():
    from tijdloze_musicbrainz_spark.plans.lifecycle import (
        PROBE_PUSHDOWN_MAX_IN,
    )

    ab = _load()
    assert set(ab["shapes"]) >= {"m1", "m4"}
    assert ab["default_cap"] == PROBE_PUSHDOWN_MAX_IN
    # the bigger shape really is bigger — the A/B covers two shapes,
    # not one measured twice
    assert ab["shapes"]["m4"]["rows"] > 2 * ab["shapes"]["m1"]["rows"]


def test_in_list_cost_grows_with_k_and_cliff_is_real():
    """The measured physics behind the cap: In-list cost is ~linear in
    k (monotone ladder at both shapes) while pruning saturates — the
    near-sidecar-cap list is strictly SLOWER than not pushing at all
    (the diagnosed r13 'steal spike'), at both shapes."""
    for shape, s in _load()["shapes"].items():
        ladder = sorted((int(k), v) for k, v in s["in_k_sec"].items())
        ks = [k for k, _ in ladder]
        assert ks[-1] >= 3000, f"{shape}: ladder missing the near-cap point"
        # monotone within noise: each step no more than 20% below prior
        for (k0, t0), (k1, t1) in zip(ladder, ladder[1:]):
            assert t1 >= t0 * 0.8, (
                f"{shape}: In({k1})={t1} faster than In({k0})={t0} — "
                "the linear-cost story broke"
            )
        assert ladder[-1][1] > s["unfiltered_sec"] * 1.5, (
            f"{shape}: no cliff at the near-cap list — the cap may be "
            "obsolete, re-run tools/probe_cap_ab.py"
        )


def test_default_cap_decision_holds_at_both_shapes():
    """The decision itself: at the shipped cap, pushing costs at most
    bounded regret on the small shape (fixed scan overhead dominates;
    absolute delta ~0.1 s) and WINS on the bigger shape, where pruning
    has row groups to skip — the asymmetry that makes the break-even a
    store-shape property, hence a conf."""
    ab = _load()
    cap = str(ab["default_cap"])
    m1, m4 = ab["shapes"]["m1"], ab["shapes"]["m4"]
    assert m1["in_k_sec"][cap] <= m1["unfiltered_sec"] * 1.7
    assert m4["in_k_sec"][cap] <= m4["unfiltered_sec"] * 1.1


def test_cap_conf_is_respected_at_import():
    """SPARK_GRAFT_PROBE_MAX_IN really reaches the constant (fresh
    interpreter: the conf is read at import time)."""
    env = dict(os.environ, SPARK_GRAFT_PROBE_MAX_IN="77")
    env["PYTHONPATH"] = os.path.join(HERE, "..")
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "from tijdloze_musicbrainz_spark.plans.lifecycle import "
            "PROBE_PUSHDOWN_MAX_IN as c; print(c)",
        ],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    assert out.stdout.strip() == "77"
