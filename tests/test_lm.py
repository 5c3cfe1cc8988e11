"""Bigram Stupid-Backoff LM training / perplexity scoring / CCNet
buckets (operators/lm.py) — hand-computed expectations."""

from __future__ import annotations

import math

import pytest

from deepseek_ocr_omnidocbench_spark.operators.lm import (
    lm_score,
    ppl_buckets,
    train_bigram_lm,
)

CORPUS = [(0, "a b a b"), (1, "a b c"), (2, "x")]
# unigrams: a:3 b:3 c:1 x:1, total 8
# bigrams:  (a,b):3 (b,a):1 (b,c):1;  c1(a)=3, c1(b)=3


@pytest.fixture(scope="module")
def model(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bi, uni = train_bigram_lm(docs)
    return docs, bi, uni


class TestTrainScore:
    def test_model_tables(self, model):
        _, bi, uni = model
        b = {(r["w1"], r["w2"]): r["logp"] for r in bi.collect()}
        assert b[("a", "b")] == pytest.approx(0.0)
        assert b[("b", "a")] == pytest.approx(math.log10(1 / 3))
        assert b[("b", "c")] == pytest.approx(math.log10(1 / 3))
        u = {r["w"]: r["logp_bo"] for r in uni.collect()}
        assert u["a"] == pytest.approx(math.log10(0.4 * 3 / 8))
        assert u["x"] == pytest.approx(math.log10(0.4 * 1 / 8))

    def test_in_corpus_perplexity(self, model):
        docs, bi, uni = model
        out = {r["doc_id"]: r for r in lm_score(docs, bi, uni).collect()}
        # d0: lp = 0 + log10(1/3) + 0 over 3 bigrams -> ppl = 3^(1/3)
        assert out[0]["ppl"] == pytest.approx(3 ** (1 / 3))
        # d1: 0 + log10(1/3) over 2 -> sqrt(3)
        assert out[1]["ppl"] == pytest.approx(math.sqrt(3))
        # d2: single word, no bigram evidence
        assert out[2]["ppl"] is None and out[2]["n_bigrams"] == 0

    def test_backoff_and_oov(self, model, spark):
        _, bi, uni = model
        new = spark.createDataFrame([(10, "c a"), (11, "z q")],
                                    "doc_id long, text string")
        out = {r["doc_id"]: r["ppl"] for r in lm_score(new, bi, uni).collect()}
        # (c,a) unseen -> backoff alpha*c(a)/total = 0.4*3/8 = 0.15
        assert out[10] == pytest.approx(1 / 0.15)
        # (z,q): q OOV -> -12 floor
        assert out[11] == pytest.approx(10.0 ** 12, rel=1e-6)

    def test_min_count_prunes(self, model, spark):
        docs, _, _ = model
        bi, _ = train_bigram_lm(docs, min_count=2)
        assert {(r["w1"], r["w2"]) for r in bi.collect()} == {("a", "b")}


class TestBuckets:
    def test_thirds_per_lang(self, spark):
        rows = [(i, "en", float(i + 1)) for i in range(7)]
        rows += [(10, "de", 5.0), (11, "de", 1.0), (12, "de", 3.0)]
        rows += [(20, "en", None)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
        out = {r["doc_id"]: r["bucket"] for r in ppl_buckets(df).collect()}
        # 7 en docs -> ntile sizes 3/2/2 by ascending ppl
        assert [out[i] for i in range(7)] == (
            ["head"] * 3 + ["middle"] * 2 + ["tail"] * 2)
        assert (out[11], out[12], out[10]) == ("head", "middle", "tail")
        assert out[20] == "na"


class TestKneserNey:
    """train_kn_bigram / kn_score vs an independent Python replay and
    the textbook normalization property."""

    def _model(self, spark, corpus):
        from deepseek_ocr_omnidocbench_spark.operators.lm import (
            train_kn_bigram,
        )
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        return (docs,) + train_kn_bigram(docs)

    def test_hand_computed(self, spark):
        docs, bi, lam, cont = self._model(spark, CORPUS)
        # bigram types: (a,b) (b,a) (b,c) -> n_types=3
        # N1+(.b)=1, N1+(.a)=1, N1+(.c)=1 -> pcont = 1/3 each
        # c1(a)=3, N1+(a.)=1 -> lam(a) = .75*1/3 = .25
        # p(b|a) = (3-.75)/3 + .25 * (1/3)
        got = {(r["w1"], r["w2"]): r["p"] for r in bi.collect()}
        assert got[("a", "b")] == pytest.approx(
            (3 - 0.75) / 3 + 0.25 * (1 / 3))
        lams = {r["w1"]: r["lam"] for r in lam.collect()}
        assert lams["a"] == pytest.approx(0.25)
        # c1(b)=2, N1+(b.)=2 -> lam(b) = .75*2/2 = .75
        assert lams["b"] == pytest.approx(0.75)
        conts = {r["w2"]: r["pcont"] for r in cont.collect()}
        assert conts["b"] == pytest.approx(1 / 3)

    def test_distribution_normalizes(self, spark):
        # sum over seen w2 of p(w2|w1) + lam(w1) * (pcont mass of
        # UNSEEN continuations) must equal 1 for every context.
        corpus = [(i, t) for i, t in enumerate(
            ["the cat sat on the mat", "the dog sat", "a cat ran",
             "the cat ran on a mat", "dogs ran far"])]
        _, bi, lam, cont = self._model(spark, corpus)
        conts = {r["w2"]: r["pcont"] for r in cont.collect()}
        lams = {r["w1"]: r["lam"] for r in lam.collect()}
        seen: dict[str, list] = {}
        for r in bi.collect():
            seen.setdefault(r["w1"], []).append((r["w2"], r["p"]))
        for w1, pairs in seen.items():
            mass = sum(p for _, p in pairs)
            unseen_cont = sum(pc for w2, pc in conts.items()
                              if w2 not in {w for w, _ in pairs})
            assert mass + lams[w1] * unseen_cont == pytest.approx(1.0)

    def test_score_backoff_ladder(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.lm import kn_score
        docs, bi, lam, cont = self._model(spark, CORPUS)
        # "a c": unseen bigram, seen w1 -> lam(a)*pcont(c)
        # "z c": unseen w1 -> pcont(c); "a z": unseen cont -> floor
        probe = spark.createDataFrame(
            [(10, "a c"), (11, "z c"), (12, "a z")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["kn_ppl"]
               for r in kn_score(probe, bi, lam, cont).collect()}
        import math
        assert got[10] == pytest.approx(
            10 ** -math.log10(0.25 * (1 / 3)))
        assert got[11] == pytest.approx(10 ** -math.log10(1 / 3))
        assert got[12] == pytest.approx(10 ** 12)

    def test_short_docs_null(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.lm import kn_score
        docs, bi, lam, cont = self._model(spark, CORPUS)
        probe = spark.createDataFrame([(0, "solo"), (1, "")],
                                      "doc_id long, text string")
        rows = {r["doc_id"]: r for r in
                kn_score(probe, bi, lam, cont).collect()}
        assert rows[0]["kn_ppl"] is None and rows[0]["n_bigrams"] == 0
        assert rows[1]["kn_ppl"] is None
