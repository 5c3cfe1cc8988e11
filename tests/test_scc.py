"""SCC + Broder bow-tie decomposition: brute-force parity on random
digraphs, hand-built structures, and the adversarial chain bound."""

from __future__ import annotations

import random

import pytest

from deepseek_ocr_omnidocbench_spark.operators.graph import bowtie, scc


def _brute_scc(edges: list[tuple[int, int]]) -> dict[int, int]:
    """scc_id = min node id mutually reachable, via per-node BFS."""
    nodes = sorted({u for e in edges for u in e})
    adj: dict[int, list[int]] = {u: [] for u in nodes}
    for a, b in edges:
        if a != b:
            adj[a].append(b)

    def reach(s: int) -> set[int]:
        seen, stack = {s}, [s]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        return seen

    r = {u: reach(u) for u in nodes}
    return {u: min(v for v in nodes if u in r[v] and v in r[u])
            for u in nodes}


def _run_scc(spark, edges, **kw) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["scc_id"] for r in scc(df, **kw).collect()}


class TestScc:
    def test_two_cycles_bridge(self, spark):
        # cycle {1,2,3} -> bridge -> cycle {10,11}
        edges = [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 10)]
        out = _run_scc(spark, edges)
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_pure_dag_all_singletons(self, spark):
        edges = [(1, 2), (1, 3), (2, 4), (3, 4)]
        out = _run_scc(spark, edges)
        assert out == {1: 1, 2: 2, 3: 3, 4: 4}

    def test_chain_resolves_within_rounds(self, spark):
        # worst case: one anchor extracted per round
        edges = [(i, i + 1) for i in range(1, 5)]
        out = _run_scc(spark, edges, max_rounds=6)
        assert out == {i: i for i in range(1, 6)}

    def test_chain_beyond_rounds_raises(self, spark):
        edges = [(i, i + 1) for i in range(1, 8)]
        with pytest.raises(ValueError, match="unresolved"):
            _run_scc(spark, edges, max_rounds=2)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_digraph_parity(self, spark, seed):
        rng = random.Random(seed)
        n = 24
        edges = list({(rng.randrange(n), rng.randrange(n))
                      for _ in range(70)})
        edges = [(a, b) for a, b in edges if a != b]
        assert _run_scc(spark, edges, max_rounds=12) == _brute_scc(edges)

    def test_self_loops_ignored_and_empty(self, spark):
        df = spark.createDataFrame([(5, 5)], "src long, dst long")
        assert scc(df).count() == 0


class TestBowtie:
    def test_hand_built_bowtie(self, spark):
        edges = [
            (10, 11), (11, 12), (12, 10),      # core cycle
            (2, 1), (1, 10),                   # IN chain
            (12, 20), (20, 21),                # OUT chain
            (1, 30),                           # tendril off the IN side
            (40, 41), (41, 40),                # disconnected pair SCC
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r["node"]: (r["scc_id"], r["region"])
               for r in bowtie(df).collect()}
        assert out[10] == (10, "core")
        assert out[11] == (10, "core") and out[12] == (10, "core")
        assert out[1] == (1, "in") and out[2] == (2, "in")
        assert out[20] == (20, "out") and out[21] == (21, "out")
        assert out[30] == (30, "tendril")
        assert out[40] == (40, "disconnected")
        assert out[41] == (40, "disconnected")

    def test_largest_scc_wins_core(self, spark):
        # two SCCs: size 3 and size 2 — core must be the size-3 one
        edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r["node"]: r["region"] for r in bowtie(df).collect()}
        assert out[1] == out[2] == out[3] == "core"
        # the 2-cycle shares no undirected path with the core
        assert out[10] == out[11] == "disconnected"
