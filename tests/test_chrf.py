"""chrF (functions/chrf.py) vs an independent Python implementation
of Popović's definition."""

from __future__ import annotations

from collections import Counter

import pytest

from deepseek_ocr_omnidocbench_spark.functions.chrf import chrf_scores


def _py_chrf(hyp: str, ref: str, n_max: int = 6, beta: float = 2.0):
    h = "".join(hyp.split())
    r = "".join(ref.split())
    ps, rs = [], []
    for n in range(1, n_max + 1):
        hg = Counter(h[i:i + n] for i in range(len(h) - n + 1))
        rg = Counter(r[i:i + n] for i in range(len(r) - n + 1))
        th, tr = sum(hg.values()), sum(rg.values())
        if th == 0 or tr == 0:
            continue
        m = sum(min(c, rg[g]) for g, c in hg.items())
        ps.append(m / th)
        rs.append(m / tr)
    if not ps:
        return 0.0
    p, r_ = sum(ps) / len(ps), sum(rs) / len(rs)
    if p + r_ == 0:
        return 0.0
    b2 = beta * beta
    return (1 + b2) * p * r_ / (b2 * p + r_)


def _spark_chrf(spark, pairs):
    df = spark.createDataFrame(
        [(i, h, r) for i, (h, r) in enumerate(pairs)],
        "doc_id long, hyp string, ref string")
    return {r["doc_id"]: r["chrf"]
            for r in chrf_scores(df, "hyp", "ref").collect()}


class TestChrf:
    def test_identical_is_one(self, spark):
        got = _spark_chrf(spark, [("the quick brown fox",
                                   "the quick brown fox")])
        assert got[0] == pytest.approx(1.0)

    def test_whitespace_invariant(self, spark):
        got = _spark_chrf(spark, [("ab  cd", "abcd"), ("ab cd", "ab\ncd")])
        assert got[0] == pytest.approx(1.0)
        assert got[1] == pytest.approx(1.0)

    def test_disjoint_is_zero(self, spark):
        got = _spark_chrf(spark, [("aaaa", "bbbb")])
        assert got[0] == pytest.approx(0.0)

    def test_empty_sides(self, spark):
        got = _spark_chrf(spark, [("", "ref text"), ("hyp", ""),
                                  ("", "")])
        assert got[0] == 0.0 and got[1] == 0.0 and got[2] == 0.0

    def test_matches_python_reference(self, spark):
        pairs = [
            ("the cat sat on the mat", "the cat sat on a mat"),
            ("completely different words", "nothing in common here"),
            ("short", "a much longer reference sentence than that"),
            ("punctuation, too!", "punctuation too"),
            ("ab", "abcdef"),
        ]
        got = _spark_chrf(spark, pairs)
        for i, (h, r) in enumerate(pairs):
            assert got[i] == pytest.approx(_py_chrf(h, r)), (i, h, r)

    def test_recall_weighted(self, spark):
        # beta=2 weights recall: a hyp that's a subset of the ref
        # scores lower than a hyp that covers it with extras.
        got = _spark_chrf(spark, [("the cat", "the cat sat down"),
                                  ("the cat sat down extra", "the cat sat down")])
        assert got[1] > got[0]
