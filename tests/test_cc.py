"""Connected components / transitive cluster dedup (operators/cc.py)
vs a driver-side union-find oracle."""

import random

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.operators.cc import cluster_dedup, connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r.id, r.cluster_id)
        for r in connected_components(df).collect()
    }
    want = set(_union_find(edges).items())
    assert got == want


def test_cc_cliques_chains_singleton_edges(spark):
    edges = (
        [(1, 2), (2, 3), (1, 3)]  # clique
        + [(10, 11), (11, 12), (12, 13)]  # chain
        + [(100, 200)]  # pair
        + [(7, 7)]  # self-loop: 7 is a singleton component
    )
    _check(spark, edges)


def test_cc_long_chain_needs_multiple_rounds(spark):
    # a 400-node path has diameter 399: per-round label propagation
    # would need 399 shuffles; large/small-star must finish in O(log n)
    edges = [(i, i + 1) for i in range(1000, 1400)]
    _check(spark, edges)


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(1234)
    nodes = list(range(500))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
    ]
    _check(spark, edges)


def test_cluster_dedup_keeps_min_per_component(spark):
    docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    # components {0,1,2} (via chain), {5,6}; the rest are singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in cluster_dedup(docs, pairs, "doc_id").collect()
    )
    assert kept == [0] + [3, 4] + [5] + list(range(7, 20))


def test_cc_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
