"""Degree-oriented triangle counting (r7 verdict item 3).

On a hub graph — one node on 30% of all edges, the shape a hot part
appearing in 30% of orders projects to — id orientation keeps the
hub's full degree as join fan-out, while degree orientation bounds
every node's out-degree by O(sqrt(E)). The triangle COUNT is
orientation-invariant, so correctness stays pinned by the unchanged
DuckDB oracle; these tests pin the fan-out contrast and the
invariance itself.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tijdloze_musicbrainz_spark.plans.scaleops import orient_by_degree


def _hub_pairs(spark, n_leaves=100):
    """Hub node 0 joined to leaves 1..n, plus a leaf ring (1-2, 2-3,
    ...) so triangles exist: {0, i, i+1} for each ring edge."""
    edges = [(0, i) for i in range(1, n_leaves + 1)]
    edges += [(i, i + 1) for i in range(1, n_leaves)]
    return spark.createDataFrame(edges, "u long, v long")


def _count_triangles(edges, src="src", dst="dst"):
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    return (
        e1.join(e2, F.col(f"e2.{src}") == F.col(f"e1.{dst}"))
        .join(
            e3,
            (F.col(f"e3.{src}") == F.col(f"e1.{src}"))
            & (F.col(f"e3.{dst}") == F.col(f"e2.{dst}")),
        )
        .count()
    )


def test_degree_orientation_bounds_hub_fanout(spark):
    n_leaves = 100
    pairs = _hub_pairs(spark, n_leaves)
    n_edges = pairs.count()

    # id orientation (u < v, already how pairs is built): the hub has
    # the LOWEST id, so every hub edge fans out of it — max out-degree
    # is the full hub degree. This is the explosion the r6 SCALE note
    # warned about: the e1-e2 wedge join produces out_deg^2 rows at
    # the hub.
    id_max = (
        pairs.groupBy("u").count().agg(F.max("count")).collect()[0][0]
    )
    assert id_max == n_leaves  # the hub's entire degree

    # degree orientation: hub out-degree collapses to 0 (every
    # neighbour has lower degree), and every out-degree respects the
    # sqrt(2E) bound — the property that survives ANY hub at 100 TB.
    oriented = orient_by_degree(pairs)
    out_deg = oriented.groupBy("src").count()
    deg_max = out_deg.agg(F.max("count")).collect()[0][0]
    assert deg_max <= math.isqrt(2 * n_edges) + 1
    hub_out = out_deg.filter(F.col("src") == 0).collect()
    assert hub_out == [] or hub_out[0]["count"] == 0

    # wedge work (the e1-e2 join's row count) = sum of out_deg^2:
    # degree orientation does ~n_leaves work where id orientation
    # does ~n_leaves^2 — the measured explosion, not just the bound.
    id_wedges = (
        pairs.groupBy("u").count().agg(F.sum(F.expr("count * count"))).collect()[0][0]
    )
    deg_wedges = out_deg.agg(F.sum(F.expr("count * count"))).collect()[0][0]
    assert id_wedges >= n_leaves * n_leaves
    assert deg_wedges <= 10 * n_leaves


def test_triangle_count_is_orientation_invariant(spark):
    pairs = _hub_pairs(spark, 50)
    # id-oriented count (pairs already satisfy u < v)
    id_edges = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    got_id = _count_triangles(id_edges)
    got_deg = _count_triangles(orient_by_degree(pairs))
    # ring edge (i, i+1) closes a triangle with the hub: 49 of them
    assert got_id == got_deg == 49


def test_orientation_is_a_permutation_of_edges(spark):
    """Every undirected edge appears exactly once after orientation,
    pointed from its lower-(degree, id) endpoint."""
    pairs = _hub_pairs(spark, 30)
    oriented = orient_by_degree(pairs)
    assert oriented.count() == pairs.count()
    undirected = {
        tuple(sorted((r.src, r.dst))) for r in oriented.collect()
    }
    want = {tuple(sorted((r.u, r.v))) for r in pairs.collect()}
    assert undirected == want
    # hub (degree 30) is never a source against degree-1/3 leaves
    assert oriented.filter(F.col("src") == 0).count() == 0


def test_bfs_hops_invariants(spark, sf_dir):
    """graph_bfs_hops is a min-hop BFS: seeds at 0, every level-h node
    adjacent to a level-(h-1) node, no node past BFS_MAX_HOPS, and no
    node closer to a seed than its reported hop (triangle inequality
    over one expansion step)."""
    from tijdloze_musicbrainz_spark.plans.scaleops import (
        BFS_MAX_HOPS,
        BFS_SEED_CAP,
        BFS_SEED_MOD,
        graph_bfs_hops,
    )

    rows = graph_bfs_hops(spark, sf_dir).collect()
    hops = {r.node: r.hops for r in rows}
    assert hops, "graph should reach at least the seeds"
    assert len(rows) == len(hops), "one row per node"
    assert all(0 <= h <= BFS_MAX_HOPS for h in hops.values())
    seeds = {n for n, h in hops.items() if h == 0}
    assert seeds == {
        n for n in hops if n % BFS_SEED_MOD == 0 and n < BFS_SEED_CAP
    }

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    from collections import defaultdict

    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    adj = defaultdict(set)
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    for n, h in hops.items():
        if h > 0:
            assert any(hops.get(m) == h - 1 for m in adj[n]), (n, h)
        # minimality: no neighbor is more than 1 closer
        assert all(hops.get(m, h) >= h - 1 for m in adj[n]), (n, h)


def test_bfs_fixpoint_extends_bounded_bfs(spark, sf_dir):
    """graph_bfs_fixpoint runs to an EMPTY frontier: its result must
    agree with graph_bfs_hops on every node within BFS_MAX_HOPS and be
    a superset of it (extra nodes only at hops > BFS_MAX_HOPS); it is
    a true fixpoint — one more expansion adds nothing."""
    from tijdloze_musicbrainz_spark.plans.scaleops import (
        BFS_MAX_HOPS,
        graph_bfs_fixpoint,
        graph_bfs_hops,
    )

    bounded = {r.node: r.hops for r in graph_bfs_hops(spark, sf_dir).collect()}
    full = {r.node: r.hops for r in graph_bfs_fixpoint(spark, sf_dir).collect()}
    assert set(bounded) <= set(full)
    for n, h in bounded.items():
        assert full[n] == h, (n, h, full[n])
    extras = {n: h for n, h in full.items() if n not in bounded}
    assert all(h > BFS_MAX_HOPS for h in extras.values()), extras

    # fixpoint: expanding the deepest level once more yields no new node
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    from collections import defaultdict

    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    adj = defaultdict(set)
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    adj[a].add(b)
    for n in full:
        assert all(m in full for m in adj[n]), n
