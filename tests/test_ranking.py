"""BM25 + reciprocal-rank-fusion tests (operators/ranking.py)."""

import math

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.operators.ranking import (
    bm25_scores,
    rrf_fuse,
)


def _bm25_ref(docs: list[str], terms: list[str], k1=1.2, b=0.75):
    """Independent plain-Python BM25 for parity."""
    words = [[w for w in d.lower().split() if w] for d in docs]
    n = len(docs)
    sd = sum(len(ws) for ws in words)
    out = []
    for ws in words:
        dl = len(ws)
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            df = sum(1 for other in words if t in other)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)
                        / (tf + k1 * (1.0 - b + b * (dl * n / sd))))
        out.append(round(s, 6))
    return out


def test_bm25_matches_reference_kernel(spark):
    docs = [
        "the table has a hash index on the table",
        "merge sort beats hash join sometimes",
        "a window function over the table",
        "nothing relevant here at all",
        "hash hash hash hash hash",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"])
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, ["table", "hash"]).collect()}
    want = _bm25_ref(docs, ["table", "hash"])
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w, abs=1e-6), i
    # irrelevant doc scores exactly 0
    assert got[3] == 0.0
    # tf saturation: 5x "hash" scores more than 1x but far less than 5x
    one = _bm25_ref(docs, ["hash"])[1]
    five = _bm25_ref(docs, ["hash"])[4]
    assert one < five < 5 * one


def test_bm25_term_validation(spark):
    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_scores(df, ["ok", "Bad-Term"])


def test_bm25_doc_side_never_shuffles(spark):
    """The per-document branch must reach the scorer without a hash
    exchange: corpus stats ride in as a 1-row broadcast.  (The stats
    aggregate itself is a SinglePartition exchange — allowed.)"""
    df = spark.createDataFrame(
        [(i, "table hash %d" % i) for i in range(50)], ["doc_id", "text"])
    plan = (bm25_scores(df, ["table", "hash"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan


def test_rrf_fuse_semantics(spark):
    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], ["doc_id", "score"])
    sem = spark.createDataFrame(
        [(3, 0.99), (2, 0.5), (4, 0.4)], ["doc_id", "cosine"])
    rows = {r["doc_id"]: r for r in
            rrf_fuse(lex, sem, "doc_id", k=60, top=10).collect()}
    # doc 2 appears mid in both lists; docs 1/3/4 top one list only
    assert rows[1]["rank_lex"] == 1 and rows[1]["rank_sem"] is None
    assert rows[4]["rank_lex"] is None and rows[4]["rank_sem"] == 3
    assert rows[2]["rrf"] == pytest.approx(
        round(1 / 62 + 1 / 62, 6), abs=1e-9)
    # both-list membership beats single-list membership here
    assert rows[2]["rank"] < rows[1]["rank"]
    # top truncation
    out = rrf_fuse(lex, sem, "doc_id", top=2).collect()
    assert len(out) == 2 and all(r["rank"] <= 2 for r in out)


def test_rrf_deterministic_tie_break(spark):
    lex = spark.createDataFrame(
        [(i, 1.0) for i in range(6)], ["doc_id", "score"])
    sem = spark.createDataFrame(
        [(i, 0.5) for i in range(6)], ["doc_id", "cosine"])
    a = [r["doc_id"] for r in
         rrf_fuse(lex, sem, "doc_id", top=6).orderBy("rank").collect()]
    assert a == sorted(a), a


def test_bm25_hypothesis_parity(spark):
    """Randomized corpora: Spark BM25 must equal the plain-Python
    reference on every document.  (One Spark job over many generated
    corpora beats @given-per-example Spark jobs by ~50x, so this drives
    hypothesis-style random cases through a single DataFrame.)"""
    import random

    rng = random.Random(23)
    vocab = ["table", "hash", "merge", "window", "scan", "row", "agg",
             "sort", "key", "spill"]
    docs = []
    for _ in range(80):
        n = rng.randint(0, 30)
        docs.append(" ".join(rng.choice(vocab) for _ in range(n)))
    docs += ["", "   ", "hash", "zz " * 50]
    terms = ["table", "hash", "scan"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"])
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, terms).collect()}
    want = _bm25_ref(docs, terms)
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w, abs=1e-6), (i, docs[i])


def test_rrf_randomized_invariants(spark):
    """Random score tables: fused ranking is a permutation of the union
    of ids, rrf matches the closed form for every row, and top-1 of a
    doc leading BOTH lists is that doc."""
    import random

    rng = random.Random(31)
    ids = list(range(20))
    lex_rows = [(i, rng.random()) for i in rng.sample(ids, 12)]
    sem_rows = [(i, rng.random()) for i in rng.sample(ids, 12)]
    # plant a clear double-winner
    lex_rows.append((99, 100.0))
    sem_rows.append((99, 100.0))
    lex = spark.createDataFrame(lex_rows, ["doc_id", "score"])
    sem = spark.createDataFrame(sem_rows, ["doc_id", "cosine"])
    out = rrf_fuse(lex, sem, "doc_id", top=100).collect()
    all_ids = {i for i, _ in lex_rows} | {i for i, _ in sem_rows}
    assert {r["doc_id"] for r in out} == all_ids
    assert sorted(r["rank"] for r in out) == list(range(1, len(all_ids) + 1))
    for r in out:
        want = 0.0
        if r["rank_lex"] is not None:
            want += 1 / (60 + r["rank_lex"])
        if r["rank_sem"] is not None:
            want += 1 / (60 + r["rank_sem"])
        assert r["rrf"] == pytest.approx(round(want, 6), abs=1e-9)
    assert min(out, key=lambda r: r["rank"])["doc_id"] == 99


class TestPassageChunks:
    def _chunks(self, spark, text, **kw):
        from deepseek_ocr_omnidocbench_spark.operators.ranking import (
            passage_chunks,
        )
        df = spark.createDataFrame([(0, text)],
                                   "doc_id long, text string")
        return sorted(passage_chunks(df, **kw).collect(),
                      key=lambda r: r["chunk_id"])

    def test_exact_cover(self, spark):
        words = " ".join(f"w{i}" for i in range(10))
        got = self._chunks(spark, words, size=4, stride=3)
        assert [(r["start_word"], r["n_words"]) for r in got] == \
            [(1, 4), (4, 4), (7, 4)]
        assert got[0]["chunk"] == "w0 w1 w2 w3"
        assert got[2]["chunk"] == "w6 w7 w8 w9"
        # overlap: each consecutive pair shares size - stride = 1 word
        assert got[0]["chunk"].split()[-1] == got[1]["chunk"].split()[0]

    def test_short_tail_chunk(self, spark):
        words = " ".join(f"w{i}" for i in range(11))
        got = self._chunks(spark, words, size=4, stride=3)
        assert [(r["start_word"], r["n_words"]) for r in got] == \
            [(1, 4), (4, 4), (7, 4), (10, 2)]
        assert got[3]["chunk"] == "w9 w10"

    def test_doc_shorter_than_size(self, spark):
        got = self._chunks(spark, "a b c", size=64, stride=48)
        assert len(got) == 1
        assert got[0]["n_words"] == 3 and got[0]["chunk"] == "a b c"

    def test_full_coverage_no_gaps(self, spark):
        words = " ".join(f"w{i}" for i in range(257))
        got = self._chunks(spark, words, size=64, stride=48)
        covered = set()
        for r in got:
            covered.update(range(r["start_word"],
                                 r["start_word"] + r["n_words"]))
        assert covered == set(range(1, 258))
