"""Connected-components cluster resolution (dedup.connected_components).

Reference behavior: the transitive-closure step that turns MinHash/LSH
dup PAIRS into keep/drop decisions — the reference's single-node
pipelines do this implicitly by processing dup lists in one process;
at Spark scale it needs a distributed components algorithm.
"""

from __future__ import annotations

import random

import pytest

from deepseek_ocr_omnidocbench_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r["node"]: r["cluster_id"]
            for r in connected_components(df).collect()}


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


class TestConnectedComponents:
    def test_chain_forces_multiple_rounds(self, spark):
        # path graph 0-1-2-...-15: diameter 15, min label must travel
        # the whole chain — exercises pointer jumping, not just one hop
        edges = [(i, i + 1) for i in range(15)]
        got = _cc(spark, edges)
        assert got == {i: 0 for i in range(16)}

    def test_two_components_and_ordering(self, spark):
        edges = [(5, 9), (9, 2), (40, 41), (41, 40)]
        got = _cc(spark, edges)
        assert got == {2: 2, 5: 2, 9: 2, 40: 40, 41: 40}

    def test_random_graphs_match_union_find(self, spark):
        rng = random.Random(7)
        for trial in range(3):
            n = 60
            edges = [(rng.randrange(n), rng.randrange(n))
                     for _ in range(40)]
            edges = [(a, b) for a, b in edges if a != b]
            want = _union_find(n, edges)
            got = _cc(spark, edges)
            touched = {x for e in edges for x in e}
            assert got == {x: want[x] for x in touched}, f"trial {trial}"

    def test_dedup_clusters_full_corpus(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(8)],
                                     "doc_id long")
        pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)],
                                      "doc_a long, doc_b long")
        out = {r["doc_id"]: (r["cluster_id"], r["is_survivor"])
               for r in dedup_clusters(docs, pairs).collect()}
        assert out == {0: (0, 1), 1: (1, 1), 2: (2, 1), 3: (1, 0),
                       4: (4, 1), 5: (1, 0), 6: (6, 1), 7: (6, 0)}

    def test_empty_pairs(self, spark):
        docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        out = {r["doc_id"]: (r["cluster_id"], r["is_survivor"])
               for r in dedup_clusters(docs, pairs).collect()}
        assert out == {1: (1, 1), 2: (2, 1)}

    def test_chain_round_count(self, spark):
        # doubling must finish a 64-node path well inside max_iters=10
        edges = [(i, i + 1) for i in range(63)]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r["node"]: r["cluster_id"]
               for r in connected_components(df, max_iters=10).collect()}
        assert got == {i: 0 for i in range(64)}


def test_connected_components_string_node_ids(spark):
    """Node ids need not be numeric: host/url graphs cluster with
    lexicographic min labels and no silent NULL casts."""
    from deepseek_ocr_omnidocbench_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [("b.example", "a.example"), ("c.example", "b.example"),
         ("z.example", "y.example")],
        "a string, b string")
    got = {r.node: r.cluster_id
           for r in connected_components(edges, a_col="a", b_col="b")
           .collect()}
    assert got == {"a.example": "a.example", "b.example": "a.example",
                   "c.example": "a.example", "y.example": "y.example",
                   "z.example": "y.example"}
