"""Property tests for the batch-5 evaluation kernels: randomized
brute-force parity (AUC pairwise counting, KS ECDF scan) and plan-shape
pins (exchange counts) for the operators whose 100 TB story depends on
a specific shuffle shape."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.operators.classifier import auc_report
from deepseek_ocr_omnidocbench_spark.operators.filters import (
    host_suffix_stats,
)
from deepseek_ocr_omnidocbench_spark.operators.textstats import ks_by_group


def _brute_auc(pairs: list[tuple[float, int]]) -> float | None:
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    num = 0.0
    for p in pos:
        for q in neg:
            num += 1.0 if p > q else (0.5 if p == q else 0.0)
    return num / (len(pos) * len(neg))


def _brute_ks(a: list[int], b: list[int]) -> float:
    vals = sorted(set(a) | set(b))
    best = 0.0
    for v in vals:
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        best = max(best, abs(fa - fb))
    return best


class TestAucProperty:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_pairwise_counting(self, spark, seed):
        rng = random.Random(seed)
        # coarse score grid forces plenty of ties
        rows = [("g", rng.randrange(8) / 8.0, rng.randrange(2))
                for _ in range(60)]
        df = spark.createDataFrame(rows,
                                   "source string, score double, label int")
        got = auc_report(df).collect()[0]["auc"]
        want = _brute_auc([(s, y) for _, s, y in rows])
        assert got == round(want, 6)

    def test_auc_invariant_to_monotone_transform(self, spark):
        rng = random.Random(7)
        rows = [(rng.random(), rng.randrange(2)) for _ in range(40)]
        d1 = spark.createDataFrame([("g", s, y) for s, y in rows],
                                   "source string, score double, label int")
        # squaring preserves order on [0,1] -> identical AUC
        d2 = spark.createDataFrame([("g", s * s, y) for s, y in rows],
                                   "source string, score double, label int")
        assert auc_report(d1).collect()[0]["auc"] == \
            auc_report(d2).collect()[0]["auc"]


class TestKsProperty:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_ecdf_scan(self, spark, seed):
        rng = random.Random(seed)
        a = [rng.randrange(20) for _ in range(30)]
        b = [rng.randrange(25) for _ in range(45)]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "source string, n long")
        out = {r["source"]: r for r in ks_by_group(df, "n").collect()}
        # group 'a' vs rest (= b), and vice versa — D is symmetric
        want = round(_brute_ks(a, b), 6)
        assert out["a"]["d_stat"] == want
        assert out["b"]["d_stat"] == want


class TestPlanShapes:
    def test_auc_report_two_exchanges_before_sort(self, spark):
        df = spark.createDataFrame(
            [("g", i / 8.0, i % 2) for i in range(16)],
            "source string, score double, label int")
        plan = auc_report(df)._jdf.queryExecution() \
            .executedPlan().toString()
        # one exchange feeds BOTH windows (rank + tie count share the
        # group partitioning); one more for the final agg
        assert plan.count("Exchange hashpartitioning") == 2

    def test_host_suffix_single_exchange(self, spark):
        df = spark.createDataFrame([("h", "abc"), ("h", "zbc")],
                                   "source string, text string")
        plan = host_suffix_stats(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1

    def test_scored_scan_prunes_columns(self, spark, tmp_path):
        # classifier eval must not drag text/html through its shuffle
        p = str(tmp_path / "scored.parquet")
        spark.createDataFrame(
            [("g", 0.5, 1, "x" * 100)],
            "source string, score double, label int, text string"
        ).write.parquet(p)
        plan = auc_report(spark.read.parquet(p))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "text" not in plan.split("ReadSchema")[1][:200]
