"""Connected-components unit tests: convergence and cluster semantics
(operators/graph.py) on adversarial shapes the corpus fixture doesn't hit."""

from __future__ import annotations

import pytest

from kwack_spark.operators.graph import connected_components, dedup_clusters


def _cc_map(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = connected_components(df)
    return {r.node: r.component for r in out.collect()}


def test_two_components(spark):
    got = _cc_map(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_long_chain_converges(spark):
    """Diameter-9 chain needs multiple propagation rounds."""
    got = _cc_map(spark, [(i, i + 1) for i in range(1, 10)])
    assert got == {i: 1 for i in range(1, 11)}


def test_edge_direction_irrelevant(spark):
    """Propagation is undirected regardless of (src, dst) orientation."""
    got = _cc_map(spark, [(9, 3), (3, 7), (8, 9)])
    assert got == {3: 3, 7: 3, 8: 3, 9: 3}


def test_dedup_clusters_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"])
    rows = {r.doc_id: (r.keep_id, r.cluster_size) for r in dedup_clusters(df).collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 5: (5, 2), 6: (5, 2)}


def test_max_iter_caps_rounds(spark):
    """With max_iter=1 a long chain must NOT be fully merged (labels move
    one hop per round) — guards against accidental closure in one pass.
    max_collect_edges=0 forces the distributed iteration (the fast path
    resolves any under-cap graph exactly, so max_iter is moot there)."""
    df = spark.createDataFrame([(i, i + 1) for i in range(1, 6)], ["id_a", "id_b"])
    out = connected_components(df, max_iter=1, max_collect_edges=0)
    comps = {r.component for r in out.collect()}
    assert len(comps) > 1


def test_fast_path_matches_distributed(spark):
    """Under the collect cap the union-find labels must equal the
    distributed iteration's bit-for-bit (min-id component roots)."""
    edges = [(i, i + 1) for i in range(1, 8)] + [(20, 21), (21, 22), (40, 41)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = {(r.component, r.node) for r in connected_components(df).collect()}
    dist = {
        (r.component, r.node)
        for r in connected_components(df, max_collect_edges=0).collect()
    }
    assert fast == dist
