"""triangle_count: known closed forms, canonicalization, hub-graph
wedge suppression, and a brute-force cross-check on a pseudo-random
graph.
"""

import itertools

import pytest

from cassandrastack_spark.operators.graph import triangle_count


def _counts(df):
    return {r["node"]: r["triangles"] for r in df.collect()}


def test_triangle_count_complete_graph_k4(spark):
    # K4: every node sits in C(3,2) = 3 triangles; input is directed,
    # duplicated, and self-looped to exercise canonicalization
    edges = [(i, j) for i in range(4) for j in range(4) if i != j]
    edges += [(0, 0), (1, 2), (1, 2)]  # loop + duplicates
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _counts(triangle_count(df))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_star_graph_is_zero(spark):
    # star: the hub's edges all point INTO it after degree orientation,
    # so no wedges form at the hub and every count is 0
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 20)], "src long, dst long"
    )
    got = _counts(triangle_count(df))
    assert set(got.values()) == {0}
    assert len(got) == 20  # every incident node reports a row


def test_triangle_count_matches_brute_force(spark):
    # deterministic pseudo-random graph; reference = literal triple loop
    n = 30
    edges = [
        (i, j)
        for i, j in itertools.combinations(range(n), 2)
        if (i * 31 + j * 17) % 5 == 0
    ]
    adj = {i: set() for i in range(n)}
    for i, j in edges:
        adj[i].add(j)
        adj[j].add(i)
    ref = {i: 0 for i in range(n)}
    for a, b, c in itertools.combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            ref[a] += 1
            ref[b] += 1
            ref[c] += 1
    incident = {i for i in range(n) if adj[i]}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _counts(triangle_count(df))
    assert got == {i: ref[i] for i in incident}
    # global invariant: per-node counts sum to 3x the triangle total
    assert sum(got.values()) % 3 == 0


def test_triangle_count_string_ids(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string",
    )
    got = _counts(triangle_count(df))
    assert got == {"a": 1, "b": 1, "c": 1, "d": 0}
