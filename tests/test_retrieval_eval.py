"""Retrieval evaluation (nDCG/MRR/recall/P@k) and the KS drift test:
hand-computed scorecards and exact-statistic checks."""

from __future__ import annotations

import math

from deepseek_ocr_omnidocbench_spark.operators.ranking import retrieval_eval
from deepseek_ocr_omnidocbench_spark.operators.textstats import ks_by_group

W = [1.0 / math.log2(i + 1) for i in range(1, 11)]


def _frames(spark, runs, qrels):
    r = spark.createDataFrame(runs, "query_id long, doc_id long, rank int")
    q = spark.createDataFrame(qrels, "query_id long, doc_id long, rel int")
    return r, q


class TestRetrievalEval:
    def test_perfect_ranking(self, spark):
        runs = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
        qrels = [(1, 10, 2), (1, 11, 1), (1, 12, 0)]
        out = retrieval_eval(*_frames(spark, runs, qrels), k=10).collect()[0]
        assert out["ndcg"] == 1.0
        assert out["mrr"] == 1.0
        assert out["recall"] == 1.0
        assert out["hits"] == 2 and out["n_rel"] == 2
        assert out["precision"] == 0.2

    def test_hand_computed_reversed(self, spark):
        # relevant docs pushed to ranks 2 and 3; rank 1 unjudged
        runs = [(1, 99, 1), (1, 11, 2), (1, 10, 3)]
        qrels = [(1, 10, 2), (1, 11, 1)]
        out = retrieval_eval(*_frames(spark, runs, qrels), k=10).collect()[0]
        dcg = 1.0 * W[1] + 3.0 * W[2]
        idcg = 3.0 * W[0] + 1.0 * W[1]
        assert out["ndcg"] == round(dcg / idcg, 6)
        assert out["mrr"] == 0.5
        assert out["recall"] == 1.0

    def test_no_relevant_judgments(self, spark):
        runs = [(1, 10, 1)]
        qrels = [(1, 10, 0)]
        out = retrieval_eval(*_frames(spark, runs, qrels), k=10).collect()[0]
        assert out["ndcg"] == 0.0 and out["mrr"] == 0.0
        assert out["recall"] == 0.0 and out["n_rel"] == 0

    def test_relevant_below_k_costs_recall(self, spark):
        # rel doc at rank 3, k=2: no hit, but n_rel counts it
        runs = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
        qrels = [(1, 12, 1)]
        out = retrieval_eval(*_frames(spark, runs, qrels), k=2).collect()[0]
        assert out["hits"] == 0 and out["n_rel"] == 1
        assert out["recall"] == 0.0 and out["ndcg"] == 0.0

    def test_queries_independent(self, spark):
        runs = [(1, 10, 1), (2, 10, 1)]
        qrels = [(1, 10, 1)]
        out = {r["query_id"]: r for r in
               retrieval_eval(*_frames(spark, runs, qrels), k=10).collect()}
        assert out[1]["ndcg"] == 1.0 and out[2]["ndcg"] == 0.0


class TestKsByGroup:
    def _ks(self, spark, rows):
        df = spark.createDataFrame(rows, "source string, n long")
        return {r["source"]: r for r in ks_by_group(df, "n").collect()}

    def test_identical_distributions_d_zero(self, spark):
        rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
        out = self._ks(spark, rows)
        assert out["a"]["d_stat"] == 0.0
        assert out["a"]["p_approx"] == 1.0  # series clamps at 1

    def test_disjoint_distributions_d_one(self, spark):
        rows = [("a", 1), ("a", 2), ("b", 10), ("b", 11)]
        out = self._ks(spark, rows)
        assert out["a"]["d_stat"] == 1.0
        assert out["a"]["n_a"] == 2 and out["a"]["n_b"] == 2

    def test_hand_computed_half(self, spark):
        # a={1,2}, rest={1,3}: ECDF gap peaks at value 2 -> D = 1/2
        rows = [("a", 1), ("a", 2), ("b", 1), ("b", 3)]
        out = self._ks(spark, rows)
        assert out["a"]["d_stat"] == 0.5
        assert out["b"]["d_stat"] == 0.5

    def test_p_value_formula(self, spark):
        rows = [("a", 1), ("a", 2), ("b", 10), ("b", 11)]
        out = self._ks(spark, rows)
        lam2 = 1.0 * (2 * 2) / 4.0  # d=1, n_a*n_b/(n_a+n_b)=1
        p = 2.0 * sum((-1) ** (j - 1) * math.exp(-2.0 * j * j * lam2)
                      for j in range(1, 6))
        assert out["a"]["p_approx"] == round(min(max(p, 0.0), 1.0), 6)
