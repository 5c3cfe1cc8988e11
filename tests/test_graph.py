"""PageRank (operators/graph.py) vs an independent dense power
iteration."""

from __future__ import annotations

import pytest

from deepseek_ocr_omnidocbench_spark.operators.graph import (
    host_link_stats,
    pagerank,
)


def _dense_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({x for e in edges for x in e[:2]})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw = [0.0] * n
    for s, _, w in edges:
        outw[idx[s]] += w
    rank = [1.0 / n] * n
    for _ in range(iters):
        dang = sum(rank[i] for i in range(n) if outw[i] == 0.0)
        contrib = [0.0] * n
        for s, t, w in edges:
            contrib[idx[t]] += rank[idx[s]] * w / outw[idx[s]]
        rank = [(1 - d) / n + d * (contrib[i] + dang / n)
                for i in range(n)]
    return {nodes[i]: rank[i] for i in range(n)}


def _spark_pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


class TestPagerank:
    def test_two_node_cycle(self, spark):
        got = _spark_pr(spark, [("a", "b", 1.0), ("b", "a", 1.0)])
        assert got["a"] == pytest.approx(0.5)
        assert got["b"] == pytest.approx(0.5)

    def test_dangling_node(self, spark):
        edges = [("a", "b", 1.0)]
        got = _spark_pr(spark, edges)
        want = _dense_pagerank(edges)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0)

    def test_weighted_random_graph(self, spark):
        import random
        rng = random.Random(3)
        hosts = [f"h{i}" for i in range(12)]
        edges = [(rng.choice(hosts), rng.choice(hosts),
                  float(rng.randint(1, 5))) for _ in range(40)]
        edges = [e for e in edges if e[0] != e[1]]
        got = _spark_pr(spark, edges, iters=8)
        want = _dense_pagerank(edges, iters=8)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9)
        assert sum(got.values()) == pytest.approx(1.0)

    def test_join_back_to_docs(self, spark):
        ranks = spark.createDataFrame([("a.com", 0.7), ("b.com", 0.3)],
                                      "node string, rank double")
        docs = spark.createDataFrame(
            [(1, "a.com"), (2, "b.com"), (3, "c.com")],
            "doc_id long, host string")
        out = {r["doc_id"]: r["rank"]
               for r in host_link_stats(ranks, docs).collect()}
        assert out == {1: 0.7, 2: 0.3, 3: None}


def test_extract_links_and_host_edges(spark):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        extract_links,
        host_edges,
        pagerank,
    )
    from pyspark.sql import functions as F

    pages = spark.createDataFrame([
        ("https://a.example/1",
         '<p>x</p><a href="https://b.example/p">to b</a>'
         '<a href="https://b.example/q">b again</a>'
         '<a href="https://a.example/self">self</a>'),
        ("https://b.example/1",
         '<a class="x" href="https://c.example/">to c</a><a>no href</a>'),
        ("https://c.example/1", "<p>no links at all</p>"),
        # href-less anchors and nested markup must not shift the
        # (href, text) pairing: '<a name=..>skipme</a>' is not a link.
        ("https://d.example/1",
         '<a name="top">skipme</a><a href="https://e.example/x">'
         '<b>bold</b> text</a><a href="https://f.example/y">plain</a>'),
    ], "url string, html_text string")
    links = extract_links(pages).collect()
    trips = [(r["src_url"], r["dst_url"], r["anchor_text"]) for r in links]
    assert ("https://a.example/1", "https://b.example/p", "to b") in trips
    assert ("https://d.example/1", "https://e.example/x",
            "bold text") in trips
    assert ("https://d.example/1", "https://f.example/y", "plain") in trips
    assert not any(t[2] == "skipme" for t in trips)
    assert all(t[1] for t in trips)  # no NULL/empty dst_url rows
    edges = {(r["src"], r["dst"]): r["weight"]
             for r in host_edges(extract_links(pages)).collect()}
    assert edges[("a.example", "b.example")] == 2   # two links folded
    assert edges[("b.example", "c.example")] == 1
    assert ("a.example", "a.example") not in edges  # self-loop dropped
    # composes with pagerank: b receives from a, c from b
    e = host_edges(extract_links(pages)).withColumnRenamed("weight", "w")
    ranks = {r["node"]: r["rank"] for r in
             pagerank(e.selectExpr("src", "dst", "w as weight"),
                      iters=5).collect()}
    assert ranks["b.example"] > ranks["a.example"]


def test_harmonic_centrality_chain_and_truncation(spark):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        harmonic_centrality,
    )

    # path graph a -> b -> c -> d -> e -> f, plus a self-loop (ignored)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
         ("a", "a")],
        "src string, dst string")
    got = {r["node"]: r["harmonic"]
           for r in harmonic_centrality(edges, max_hops=4).collect()}
    # d is reached at dist 1 (c), 2 (b), 3 (a): 1 + 1/2 + 1/3
    assert abs(got["d"] - round(1 + 0.5 + 1 / 3, 6)) < 1e-6
    # f is 5 hops from a — truncated at 4: contributions from e,d,c,b only
    assert abs(got["f"] - round(1 + 0.5 + 1 / 3 + 0.25, 6)) < 1e-6
    assert "a" not in got  # nothing reaches the chain head


def test_harmonic_sketch_tracks_exact_within_hll_error(spark):
    """HyperBall sketch vs the exact operator on a 24-host ring+chords
    graph: per-node relative error stays inside ~2x the HLL standard
    error (1.04/sqrt(m) ~ 6.5% at p=8), and the hop-truncation semantics
    (same max_hops) carry over."""
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        harmonic_centrality,
        harmonic_sketch,
    )

    n = 24
    rows = []
    for i in range(n):
        rows.append((f"n{i}", f"n{(i + 1) % n}"))        # ring
        rows.append((f"n{i}", f"n{(i + 7) % n}"))        # chord
    edges = spark.createDataFrame(rows, "src string, dst string")
    exact = {r["node"]: r["harmonic"]
             for r in harmonic_centrality(edges, max_hops=3).collect()}
    approx = {r["node"]: r["harmonic"]
              for r in harmonic_sketch(edges, max_hops=3, p=8).collect()}
    assert set(approx) == set(exact)
    for node, ex in exact.items():
        assert abs(approx[node] - ex) / ex < 0.15, (node, approx[node], ex)


def test_harmonic_sketch_deterministic(spark):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        harmonic_sketch,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string")
    one = sorted(map(tuple, harmonic_sketch(edges, max_hops=4).collect()))
    two = sorted(map(tuple, harmonic_sketch(edges, max_hops=4).collect()))
    assert one == two
    # 3-cycle with a shortcut: every node reachable, all positive
    assert len(one) == 3 and all(v > 0 for _, v in one)


def test_anchor_text_profile(spark):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        anchor_text_profile,
    )

    links = spark.createDataFrame(
        [("s1", "d1", "Spark engine"), ("s2", "d1", "spark ENGINE!"),
         ("s3", "d1", "fast engine"), ("s1", "d2", "tiny"),
         ("s1", "d1", "spark")],
        "src_url string, dst_url string, anchor_text string")
    out = {(r.dst_url, r.rank): r for r in anchor_text_profile(links, top_k=2).collect()}
    # d1: engine x3 (3 sources), spark x3 (2 sources) -> engine first
    assert out[("d1", 1)].term == "engine"
    assert out[("d1", 1)].n_mentions == 3 and out[("d1", 1)].n_sources == 3
    assert out[("d1", 2)].term == "spark"
    assert out[("d1", 2)].n_mentions == 3 and out[("d1", 2)].n_sources == 2
    # top_k bounds output; single-char terms dropped
    assert ("d1", 3) not in out
    assert out[("d2", 1)].term == "tiny"


def test_anchor_text_profile_empty_and_markupless(spark):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        anchor_text_profile,
        extract_links,
    )

    pages = spark.createDataFrame(
        [("u1", '<a href="d">   </a><a href="d">real words</a>'
          '<a name="x">not a link</a>')],
        "url string, html_text string")
    out = anchor_text_profile(extract_links(pages), top_k=5).collect()
    assert sorted(r.term for r in out) == ["real", "words"]


def test_anchor_text_approx_sources_path(spark):
    """The 100 TB path: n_sources_rsd swaps exact countDistinct for
    HyperLogLog++ — one fewer Exchange in the executed plan (the exact
    distinct pre-shuffle on (dst_url, term, src_url) disappears), and
    the estimate stays within a bounded relative error of exact on the
    sf0.1 anchor corpus the gated query synthesizes."""
    import os

    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        anchor_text_profile,
    )

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("sf0.1 tables not present")
    import __spark_entry__ as entry

    links = entry._anchor_links(spark, sf_dir)
    exact = anchor_text_profile(links, top_k=5)
    approx = anchor_text_profile(links, top_k=5, n_sources_rsd=0.05)
    assert exact._jdf.queryExecution().executedPlan().toString() \
        .count("Exchange hashpartitioning") == 3
    assert approx._jdf.queryExecution().executedPlan().toString() \
        .count("Exchange hashpartitioning") == 2

    e = {(r.dst_url, r.term): r.n_sources for r in exact.collect()}
    a = {(r.dst_url, r.term): r.n_sources for r in approx.collect()}
    shared = set(e) & set(a)
    assert len(shared) > 100
    # HLL++ is within rsd relatively at scale but can wobble +/-1 in
    # absolute terms at tiny cardinalities — bound both regimes
    assert all(abs(a[k] - e[k]) <= max(1, 0.15 * e[k]) for k in shared)
    # ranking is mention-count-first: the approx tiebreak leaves the
    # top-1 term per target essentially unchanged
    e1 = {r.dst_url: r.term for r in exact.where("rank = 1").collect()}
    a1 = {r.dst_url: r.term for r in approx.where("rank = 1").collect()}
    agree = sum(e1[d] == a1[d] for d in e1) / len(e1)
    assert agree >= 0.95


def test_hits_known_graph_vs_power_iteration(spark):
    """HITS on a small digraph must match a NumPy power iteration of
    the same L1-normalized half-step scheme exactly (same arithmetic,
    same iteration count)."""
    from deepseek_ocr_omnidocbench_spark.operators.graph import hits

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"), ("d", "b"), ("b", "d")]
    got = {r["node"]: (r["auth"], r["hub"])
           for r in hits(spark.createDataFrame(edges, ["src", "dst"]),
                         iters=10).collect()}

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    hub = [1.0 / n] * n
    for _ in range(10):
        auth = [0.0] * n
        for s, d in edges:
            auth[idx[d]] += hub[idx[s]]
        z = sum(auth)
        auth = [v / z for v in auth]
        hub = [0.0] * n
        for s, d in edges:
            hub[idx[s]] += auth[idx[d]]
        z = sum(hub)
        hub = [v / z for v in hub]
    for node in nodes:
        assert got[node][0] == pytest.approx(auth[idx[node]], abs=1e-12)
        assert got[node][1] == pytest.approx(hub[idx[node]], abs=1e-12)
    assert sum(v[0] for v in got.values()) == pytest.approx(1.0)
    assert sum(v[1] for v in got.values()) == pytest.approx(1.0)


def test_hits_structure(spark):
    """A star graph: the center is the sole authority, leaves are the
    hubs; a node with no in-links has auth 0, no out-links hub 0."""
    from deepseek_ocr_omnidocbench_spark.operators.graph import hits

    edges = [("l1", "c"), ("l2", "c"), ("l3", "c")]
    r = {x["node"]: x for x in
         hits(spark.createDataFrame(edges, ["src", "dst"]),
              iters=5).collect()}
    assert r["c"]["auth"] == pytest.approx(1.0)
    assert r["c"]["hub"] == 0.0
    for leaf in ("l1", "l2", "l3"):
        assert r[leaf]["auth"] == 0.0
        assert r[leaf]["hub"] == pytest.approx(1.0 / 3)


def _dense_ppr(edges, seeds, iters=10, d=0.85):
    """Independent dense personalized power iteration (same scheme as
    operators/graph.py:personalized_pagerank)."""
    nodes = sorted({x for e in edges for x in e[:2]})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    t = [1.0 / len(seeds) if v in seeds else 0.0 for v in nodes]
    outw = [0.0] * n
    for s, _, w in edges:
        outw[idx[s]] += w
    rank = t[:]
    for _ in range(iters):
        dang = sum(rank[i] for i in range(n) if outw[i] == 0.0)
        contrib = [0.0] * n
        for s, v, w in edges:
            contrib[idx[v]] += rank[idx[s]] * w / outw[idx[s]]
        rank = [(1 - d) * t[i] + d * (contrib[i] + dang * t[i])
                for i in range(n)]
    return {nodes[i]: rank[i] for i in range(n)}


def _spark_ppr(spark, edges, seeds, **kw):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        personalized_pagerank,
    )

    e = spark.createDataFrame(edges, "src string, dst string, weight double")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {r["node"]: r["rank"]
            for r in personalized_pagerank(e, s, **kw).collect()}


class TestPersonalizedPagerank:
    def test_matches_dense_power_iteration(self, spark):
        import random
        rng = random.Random(11)
        hosts = [f"h{i}" for i in range(10)]
        edges = [(rng.choice(hosts), rng.choice(hosts),
                  float(rng.randint(1, 4))) for _ in range(35)]
        edges = [e for e in edges if e[0] != e[1]]
        seeds = {"h0", "h3"}
        got = _spark_ppr(spark, edges, seeds, iters=8)
        want = _dense_ppr(edges, seeds, iters=8)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0)

    def test_unreachable_from_seeds_gets_zero(self, spark):
        # a->b is the trusted island; x->y never receives trust
        edges = [("a", "b", 1.0), ("b", "a", 1.0), ("x", "y", 1.0)]
        got = _spark_ppr(spark, edges, {"a"}, iters=6)
        assert got["x"] == 0.0 and got["y"] == 0.0
        assert got["a"] > got["b"] > 0.0
        assert sum(got.values()) == pytest.approx(1.0)

    def test_seed_not_in_graph_raises(self, spark):
        with pytest.raises(ValueError):
            _spark_ppr(spark, [("a", "b", 1.0)], {"zzz"})

    def test_dangling_mass_returns_to_seeds(self, spark):
        # b dangles: its mass must teleport to the seed, not spread
        edges = [("a", "b", 1.0)]
        got = _spark_ppr(spark, edges, {"a"}, iters=10)
        want = _dense_ppr(edges, {"a"}, iters=10)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0)


class TestLabelPropagation:
    def test_two_cliques(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.graph import (
            label_propagation,
        )

        tri = lambda a, b, c: [(a, b), (b, c), (c, a)]
        edges = tri("a", "b", "c") + tri("d", "e", "f")
        got = {r["node"]: r["label"] for r in label_propagation(
            spark.createDataFrame(edges, ["src", "dst"]), iters=5).collect()}
        # majority tie inside each clique resolves to the asc-min label
        assert got == {"a": "a", "b": "a", "c": "a",
                       "d": "d", "e": "d", "f": "d"}

    def test_star_adopts_center_tiebreak(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.graph import (
            label_propagation,
        )

        edges = [("c", "l1"), ("c", "l2"), ("c", "l3")]
        got = {r["node"]: r["label"] for r in label_propagation(
            spark.createDataFrame(edges, ["src", "dst"]), iters=4).collect()}
        # star graphs oscillate under synchronous updates (leaves copy
        # the center's previous label while the center copies the
        # asc-min leaf label) — the output is whatever exact state the
        # fixed 4-iteration schedule dictates.  Assert the determinism
        # invariants: full node coverage, labels drawn from the node
        # set, and a re-run bit-identical.
        assert set(got) == {"c", "l1", "l2", "l3"}
        assert set(got.values()) <= {"c", "l1", "l2", "l3"}
        again = {r["node"]: r["label"] for r in label_propagation(
            spark.createDataFrame(edges, ["src", "dst"]), iters=4).collect()}
        assert got == again


def test_reciprocity_stats(spark):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        reciprocity_stats,
    )

    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"),
             ("a", "b")]  # duplicate edge must not double-count
    got = {r["node"]: (r["n_out"], r["n_recip"], r["reciprocity"])
           for r in reciprocity_stats(
               spark.createDataFrame(edges, ["src", "dst"])).collect()}
    assert got["a"] == (2, 1, 0.5)
    assert got["b"] == (1, 1, 1.0)
    assert got["c"] == (1, 0, 0.0)
    assert "d" not in got  # no out-links -> no reciprocity row


def test_degree_distribution(spark):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        degree_distribution,
    )

    edges = [("a", "b"), ("b", "c"), ("a", "b")]  # dup collapses
    got = {(r["direction"], r["degree"]): r["n_nodes"]
           for r in degree_distribution(
               spark.createDataFrame(edges, ["src", "dst"])).collect()}
    # out: a=1, b=1, c=0 ; in: a=0, b=1, c=1
    assert got == {("out", 1): 2, ("out", 0): 1,
                   ("in", 1): 2, ("in", 0): 1}


def test_community_quota_caps_per_community(spark):
    """Two 2-host communities; the cap binds per COMMUNITY, not per
    host; an unlabeled host becomes its own singleton community."""
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        community_quota,
    )

    comms = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("x", "c2"), ("y", "c2")],
        ["node", "label"])
    docs = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(8)]
        + [(100 + i, "x") for i in range(3)]
        + [(200, "lonely.example")],
        ["doc_id", "host"])
    got = {r.doc_id: r for r in
           community_quota(docs, comms, max_per_community=5).collect()}
    c1 = [r for r in got.values() if r.community == "c1"]
    assert len(c1) == 8 and sum(r.keep for r in c1) == 5
    c2 = [r for r in got.values() if r.community == "c2"]
    assert len(c2) == 3 and all(r.keep for r in c2)
    assert got[200].community == "lonely.example" and got[200].keep
    # ranks are a permutation of 1..n within each community
    assert sorted(r.comm_rank for r in c1) == list(range(1, 9))


def test_continuation_ops_exchange_budgets(spark):
    """Plan-shape regression pins: the continuation operators' gated
    queries must not grow extra shuffles.  Counts are real physical
    Exchange nodes from explain('formatted'); bounds are the measured
    shapes (degree_dist drops 17 -> 7 when its shared distinct frames
    are materialized once — keep it that way)."""
    import contextlib
    import io
    import re

    import __spark_entry__ as entry

    budgets = {"url_templates": 3, "snapshot_delta": 4,
               "reciprocity": 4, "degree_dist": 7, "crawl_budget": 4}
    for name, cap in budgets.items():
        df = entry.queries()[name](spark, "/root/testdata/sf0.01")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        n = len(re.findall(r"\(\d+\) Exchange", buf.getvalue()))
        assert n <= cap, (name, n, cap)


def test_label_propagation_random_invariants(spark):
    """Random graphs: output covers exactly the connected node set,
    labels are drawn from it, and communities respect components (a
    label never crosses a connected component boundary)."""
    import random

    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        label_propagation,
    )

    rng = random.Random(23)
    hosts = [f"h{i}" for i in range(14)]
    edges = list({(rng.choice(hosts), rng.choice(hosts))
                  for _ in range(25)})
    edges = [e for e in edges if e[0] != e[1]]
    got = {r.node: r.label for r in label_propagation(
        spark.createDataFrame(edges, ["src", "dst"]), iters=5).collect()}
    nodes = {x for e in edges for x in e}
    assert set(got) == nodes
    assert set(got.values()) <= nodes
    # component closure: union-find over undirected edges
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    for n, lab in got.items():
        assert find(n) == find(lab), (n, lab)


class TestKCore:
    def _cores(self, spark, edges, k, **kw):
        from deepseek_ocr_omnidocbench_spark.operators.graph import k_core
        df = spark.createDataFrame(edges, "src string, dst string")
        return {r["node"]: r["core_degree"]
                for r in k_core(df, k=k, **kw).collect()}

    def test_clique_with_tail(self, spark):
        # 4-clique a-b-c-d plus a chain d-e-f: 3-core is exactly the
        # clique (chain nodes peel in two waves), each at degree 3.
        clique = [(x, y) for i, x in enumerate("abcd")
                  for y in "abcd"[i + 1:]]
        edges = clique + [("d", "e"), ("e", "f")]
        got = self._cores(spark, edges, k=3)
        assert got == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_cascade_needs_multiple_peels(self, spark):
        # chain hanging off a triangle: the 2-core is the triangle;
        # the chain peels one node per round (cascade, not one shot).
        edges = [("a", "b"), ("b", "c"), ("c", "a"),
                 ("c", "d"), ("d", "e"), ("e", "f"), ("f", "g")]
        got = self._cores(spark, edges, k=2)
        assert got == {"a": 2, "b": 2, "c": 2}

    def test_empty_core(self, spark):
        got = self._cores(spark, [("a", "b"), ("b", "c")], k=2)
        assert got == {}

    def test_whole_graph_is_core(self, spark):
        # cycle: every node has degree 2 -> 2-core == whole graph,
        # and the loop must early-stop on the first fixpoint check.
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        got = self._cores(spark, edges, k=2)
        assert got == {"a": 2, "b": 2, "c": 2, "d": 2}

    def test_matches_networkx_style_reference(self, spark):
        # deterministic pseudo-random graph vs an independent Python
        # peeling implementation.
        edges = [(f"n{(7 * i) % 23}", f"n{(11 * i + 3) % 23}")
                 for i in range(60)]
        adj: dict[str, set[str]] = {}
        for s, t in edges:
            if s == t:
                continue
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
        k = 4
        changed = True
        while changed:
            drop = [n for n, nb in adj.items() if len(nb) < k]
            changed = bool(drop)
            for n in drop:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
        want = {n: len(nb) for n, nb in adj.items()}
        got = self._cores(spark, edges, k=k, max_iters=30)
        assert got == want


class TestTriangles:
    def _tri(self, spark, edges):
        from deepseek_ocr_omnidocbench_spark.operators.graph import (
            triangle_counts,
        )
        df = spark.createDataFrame(edges, "src string, dst string")
        return {r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
                for r in triangle_counts(df).collect()}

    def test_single_triangle(self, spark):
        got = self._tri(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        assert got == {"a": (2, 1, 1.0), "b": (2, 1, 1.0),
                       "c": (2, 1, 1.0)}

    def test_square_has_none(self, spark):
        got = self._tri(spark, [("a", "b"), ("b", "c"),
                                ("c", "d"), ("d", "a")])
        assert all(t == 0 for _, t, _ in got.values())

    def test_k4_every_node_in_three(self, spark):
        edges = [(x, y) for i, x in enumerate("abcd")
                 for y in "abcd"[i + 1:]]
        got = self._tri(spark, edges)
        # K4: each node in C(3,2)=3 triangles, clustering 1.0
        assert got == {n: (3, 3, 1.0) for n in "abcd"}

    def test_direction_and_dups_ignored(self, spark):
        got = self._tri(spark, [("a", "b"), ("b", "a"), ("b", "c"),
                                ("c", "a"), ("a", "c")])
        assert got["a"] == (2, 1, 1.0)

    def test_matches_brute_force(self, spark):
        edges = [(f"n{(7 * i) % 19}", f"n{(5 * i + 2) % 19}")
                 for i in range(40)]
        adj: dict[str, set[str]] = {}
        for s, t in edges:
            if s == t:
                continue
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
        want = {}
        for n, nb in adj.items():
            t = sum(1 for u in nb for v in nb
                    if u < v and v in adj.get(u, set()))
            d = len(nb)
            cc = round(2.0 * t / (d * (d - 1)), 6) if d > 1 else None
            want[n] = (d, t, cc)
        got = self._tri(spark, edges)
        assert got == want

    def test_degree_one_clustering_null(self, spark):
        got = self._tri(spark, [("a", "b"), ("b", "c"), ("c", "a"),
                                ("c", "d")])
        assert got["d"] == (1, 0, None)


class TestAssortativity:
    def _r(self, spark, edges):
        from deepseek_ocr_omnidocbench_spark.operators.graph import (
            assortativity,
        )
        df = spark.createDataFrame(edges, "src string, dst string")
        return assortativity(df).collect()[0]

    def test_star_is_minus_one(self, spark):
        got = self._r(spark, [("c", "l1"), ("c", "l2"), ("c", "l3")])
        assert got["n_edges"] == 6
        assert got["assortativity"] == -1.0

    def test_regular_graph_undefined(self, spark):
        # cycle: every degree 2 -> zero variance -> NULL
        got = self._r(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        assert got["assortativity"] is None

    def test_matches_numpy(self, spark):
        import math
        edges = [(f"n{(7 * i) % 13}", f"n{(5 * i + 2) % 13}")
                 for i in range(30)]
        edges += [("hub", f"n{i}") for i in range(9)]   # degree spread
        pairs = set()
        for s, t in edges:
            if s != t:
                pairs.add((s, t))
                pairs.add((t, s))
        deg: dict[str, int] = {}
        for s, _t in pairs:
            deg[s] = deg.get(s, 0) + 1
        xs = [deg[s] for s, _ in pairs]
        ys = [deg[t] for _, t in pairs]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
        want = round((n * sxy - sx * sy)
                     / (math.sqrt(n * sxx - sx * sx)
                        * math.sqrt(n * syy - sy * sy)), 6)
        got = self._r(spark, edges)
        assert got["assortativity"] == want


def test_cocitation_mirror_detection(spark):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        cocitation_pairs)

    edges = []
    # m1/m2 mirrors: share t0..t9; m3 shares only t0,t1 with them
    for t in range(10):
        edges += [("m1", f"t{t}"), ("m2", f"t{t}")]
    edges += [("m3", "t0"), ("m3", "t1"), ("m3", "zz")]
    # hub target linked by everyone incl. 20 noise hosts: df 23 > cap
    edges += [(s, "hub") for s in
              ["m1", "m2", "m3"] + [f"n{i}" for i in range(20)]]
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {(r.src_a, r.src_b): r
           for r in cocitation_pairs(e, min_shared=2, df_cap=10).collect()}
    assert out[("m1", "m2")].shared == 10
    # degrees over the CAPPED universe: the hub edge is excluded, so
    # the mirrors reach jaccard 1.0 over their informative targets
    assert out[("m1", "m2")].deg_a == 10
    assert out[("m1", "m2")].jaccard == 1.0
    assert out[("m1", "m3")].shared == 2
    assert out[("m1", "m3")].jaccard == 2 / 11
    # hub contributed no candidate pairs: n* hosts appear nowhere
    assert not any(k[0].startswith("n") or k[1].startswith("n")
                   for k in out)


def test_neighborhood_function_star_vs_chain(spark):
    from deepseek_ocr_omnidocbench_spark.operators.graph import (
        neighborhood_function)

    # star: every node within 2 hops of every other (via the hub)
    star = spark.createDataFrame(
        [("hub", f"n{i}") for i in range(8)]
        + [(f"n{i}", "hub") for i in range(8)], ["src", "dst"])
    rows = {r.hop: r for r in
            neighborhood_function(star, max_hops=4, p=8).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    # monotone pair growth, saturation by hop 2: frac(2) == 1.0-ish
    assert rows[0].n_micro <= rows[1].n_micro <= rows[2].n_micro
    assert rows[2].frac > 0.99
    # the 90% crossing is flagged exactly once, at hop <= 2
    eff = [h for h, r in rows.items() if r.is_effective_diameter]
    assert len(eff) == 1 and eff[0] <= 2

    # chain 0->1->...->9: pairs keep growing through all 4 hops, the
    # crossing lands later than the star's
    chain = spark.createDataFrame(
        [(f"c{i}", f"c{i + 1}") for i in range(9)], ["src", "dst"])
    crows = {r.hop: r for r in
             neighborhood_function(chain, max_hops=4, p=8).collect()}
    assert crows[4].n_micro > crows[2].n_micro
    ceff = [h for h, r in crows.items() if r.is_effective_diameter]
    assert len(ceff) == 1 and ceff[0] >= eff[0]
