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
