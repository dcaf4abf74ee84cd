"""Connected components (large-star/small-star) — the dedup clustering
step. Verified against a Python union-find brute force, with a chain
corpus asserting O(log n) round convergence (label propagation would need
O(n) rounds there)."""

import random

import pytest
from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators import (
    assign_components,
    blocked_jaccard_near_dups,
    connected_components,
)


def _brute(edges):
    """Union-find ground truth: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    out = {}
    for members in comps.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }
    return got


def test_two_components_and_roots(spark):
    edges = [(1, 2), (2, 3), (10, 11), (3, 1)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_in_log_rounds(spark):
    """A 512-node chain: label propagation needs ~512 rounds; large/small
    star must finish in O(log² n) — assert a generous ≤ 12."""
    n = 512
    edges = [(i, i + 1) for i in range(n)]
    stats = {}
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, stats=stats).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}
    assert stats["iterations"] <= 12, stats


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(400))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    assert got == _brute(edges)


def test_string_ids_and_duplicate_reversed_edges(spark):
    edges = [("b", "a"), ("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")]
    got = _run(spark, edges)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_empty_and_self_loop_only(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], ["a", "b"])
    assert connected_components(df).count() == 0


def test_null_endpoints_dropped(spark):
    df = spark.createDataFrame(
        [(1, None), (None, 2), (3, 4)], "a: long, b: long"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == {3: 3, 4: 3}


def test_assign_components_covers_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(4, 1), (2, 4)], ["a", "b"])
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in assign_components(docs, pairs, "doc_id").collect()
    }
    assert rows == {
        0: (0, True),
        1: (1, True),
        2: (1, False),
        3: (3, True),
        4: (1, False),
        5: (5, True),
    }


def test_clusters_over_jaccard_pairs(spark, sf_dir):
    """End-to-end: near-dup pairs on the documents table → clusters.
    Cluster assignment must equal union-find over the SAME pair set, and
    every pair must land in one cluster."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = blocked_jaccard_near_dups(docs, "doc_id", "text", threshold=0.4)
    edge_rows = [(r["a"], r["b"]) for r in pairs.collect()]
    out = assign_components(docs, pairs, "doc_id")
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    want = _brute(edge_rows)
    for n, c in want.items():
        assert got[n] == c
    # singletons are their own canonical
    paired = set(want)
    for n, c in got.items():
        if n not in paired:
            assert c == n
    # exactly one canonical per cluster
    canon = out.where("is_canonical").groupBy("cluster_id").count()
    assert canon.where("count > 1").count() == 0
