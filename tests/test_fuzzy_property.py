"""Completeness property for the deletion-neighborhood fuzzy join:
for ANY two string sets, fuzzy_key_join must return EXACTLY the pairs
with levenshtein distance <= 1 — i.e. the SymSpell candidate
generation misses nothing and the verify step over-keeps nothing.
Checked against a plain Python DP implementation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _lev(a: str, b: str) -> int:
    if abs(len(a) - len(b)) > 1:
        return 2  # capped: we only care about <= 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_KEYS = st.text(alphabet="abc0", min_size=0, max_size=6)


@given(
    st.lists(_KEYS, min_size=1, max_size=12, unique=True),
    st.lists(_KEYS, min_size=1, max_size=12, unique=True),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_fuzzy_key_join_is_exact_distance_1_join(spark, left_keys, right_keys):
    from tijdloze_musicbrainz_spark.plans.fuzzy import fuzzy_key_join

    left = spark.createDataFrame(
        [(i, k) for i, k in enumerate(left_keys)], "lid int, lkey string"
    )
    right = spark.createDataFrame(
        [(i, k) for i, k in enumerate(right_keys)], "rid int, rkey string"
    )
    got = {
        (r["lid"], r["rid"])
        for r in fuzzy_key_join(left, right, "lkey", "rkey").collect()
    }
    want = {
        (i, j)
        for i, a in enumerate(left_keys)
        for j, b in enumerate(right_keys)
        if _lev(a, b) <= 1
    }
    assert got == want
