"""Property tests for the large-star/small-star connected-components
core (Kiveris et al. 2014) behind ``dedup_cluster_components``.

The headline property is DIAMETER-INDEPENDENCE: a path graph of
diameter 79 (far beyond MAX_CC_ITERS=25) converges in a logarithmic
number of rounds — r4's min-label propagation would have raised its
no-fixpoint error on this exact input. A randomized differential vs a
pure-Python union-find pins correctness on arbitrary topologies.
"""

from __future__ import annotations

import math
import random

import pytest

from tijdloze_musicbrainz_spark.plans.dedup import (
    MAX_CC_ITERS,
    connected_components,
)


def _labels(spark, edge_list, max_iters=MAX_CC_ITERS):
    edges = spark.createDataFrame(edge_list, "u long, v long")
    labels, rounds = connected_components(edges, max_iters=max_iters)
    return {r.id: r.label for r in labels.collect()}, rounds


def _union_find(edge_list):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edge_list:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # path-compress to the component MINIMUM (find roots at minima
    # because we always parent the larger root under the smaller)
    return {x: find(x) for x in parent}


def test_long_path_diameter_independent(spark):
    # path 0-1-2-...-79: diameter 79 >> MAX_CC_ITERS=25. Min-label
    # propagation needs 79 rounds and would refuse; star contraction
    # must converge within ~2*log2(n) + slack rounds.
    n = 80
    edge_list = [(i, i + 1) for i in range(n - 1)]
    labels, rounds = _labels(spark, edge_list)
    assert labels == {i: 0 for i in range(n)}
    bound = 2 * math.ceil(math.log2(n)) + 2
    assert rounds <= bound, (rounds, bound)


def test_two_paths_and_singleton_edge(spark):
    # two disjoint paths + one 2-cycle-ish pair; labels are each
    # component's minimum
    edge_list = (
        [(i, i + 1) for i in range(10, 40)]
        + [(i, i + 1) for i in range(100, 160)]
        + [(500, 900)]
    )
    labels, _ = _labels(spark, edge_list)
    assert all(labels[i] == 10 for i in range(10, 41))
    assert all(labels[i] == 100 for i in range(100, 161))
    assert labels[500] == 500 and labels[900] == 500


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "u long, v long")
    labels, rounds = connected_components(edges)
    assert labels.count() == 0 and rounds == 0


def test_self_loops_and_duplicates_ignored(spark):
    edge_list = [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)]
    labels, _ = _labels(spark, edge_list)
    # self-loops contribute no edges; node 3 never appears in a real
    # edge so it is absent from the label relation entirely (callers
    # coalesce unlabeled ids to themselves)
    assert labels == {1: 1, 2: 1}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 200
    edge_list = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]
    edge_list = [(u, v) for u, v in edge_list if u != v]
    labels, rounds = _labels(spark, edge_list)
    assert labels == _union_find(edge_list)
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2
