"""Paired bootstrap / McNemar / Cohen's kappa unit tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.operators.significance import (
    cohens_kappa, mcnemar, paired_bootstrap)


def test_mcnemar_hand_counts(spark):
    rows = ([Row(a_pass=True, b_pass=True)] * 5
            + [Row(a_pass=False, b_pass=False)] * 3
            + [Row(a_pass=True, b_pass=False)] * 6
            + [Row(a_pass=False, b_pass=True)] * 2)
    out = mcnemar(spark.createDataFrame(rows)).collect()[0]
    assert (out.n, out.n_both, out.n_neither) == (16, 5, 3)
    assert (out.n_a_only, out.n_b_only) == (6, 2)
    assert out.statistic == pytest.approx((6 - 2) ** 2 / 8)
    assert out.z == pytest.approx(4 / math.sqrt(8))


def test_mcnemar_no_discordant_null(spark):
    rows = [Row(a_pass=True, b_pass=True)] * 4
    out = mcnemar(spark.createDataFrame(rows)).collect()[0]
    assert out.statistic is None and out.z is None


def test_kappa_perfect_and_chance(spark):
    perfect = spark.createDataFrame(
        [Row(label_a=x, label_b=x) for x in ["a", "b", "a", "c"]])
    out = cohens_kappa(perfect).collect()[0]
    assert out.kappa == pytest.approx(1.0)

    # Known worked example: 2 raters, yes/no, po=0.7, pe=0.5, kappa=0.4
    rows = ([Row(label_a="y", label_b="y")] * 4
            + [Row(label_a="n", label_b="n")] * 3
            + [Row(label_a="y", label_b="n")] * 2
            + [Row(label_a="n", label_b="y")] * 1)
    out = cohens_kappa(spark.createDataFrame(rows)).collect()[0]
    assert out.po == pytest.approx(0.7)
    # marginals: a(y)=6, a(n)=4; b(y)=5, b(n)=5 -> pe = (30+20)/100 = .5
    assert out.pe == pytest.approx(0.5)
    assert out.kappa == pytest.approx(0.4)


def test_kappa_grouped_and_degenerate(spark):
    rows = ([Row(g="s1", label_a="x", label_b="x")] * 2
            + [Row(g="s1", label_a="y", label_b="y")]
            + [Row(g="s2", label_a="x", label_b="x")] * 2
            + [Row(g="s3", label_a="x", label_b="y")] * 2)
    out = {r.g: r for r in
           cohens_kappa(spark.createDataFrame(rows), group_col="g")
           .collect()}
    assert out["s1"].kappa == pytest.approx(1.0)
    # s2: both raters constant on the SAME label -> pe = 1 -> NULL
    assert out["s2"].kappa is None
    # s3: disjoint vocabularies -> pe = 0, po = 0 -> kappa = 0
    assert out["s3"].pe == pytest.approx(0.0)
    assert out["s3"].kappa == pytest.approx(0.0)


def test_bootstrap_deterministic_and_sane(spark):
    # A systematically better than B by 2 on every doc: every
    # replicate sum is positive, p_boot at its floor, CI positive.
    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5 + 2).alias("metric_a"),
        (F.col("id") % 5).alias("metric_b"))
    out = paired_bootstrap(docs, b_reps=50, seed="t").collect()[0]
    assert out.n == 40 and out.b_reps == 50
    assert out.sum_delta == 80 and out.mean_delta == pytest.approx(2.0)
    assert out.n_reps_pos == 50 and out.n_reps_neg == 0
    assert out.p_boot == pytest.approx(1 / 51)
    assert out.ci_lo == pytest.approx(2.0) and out.ci_hi == pytest.approx(2.0)
    # determinism: second run bit-identical
    out2 = paired_bootstrap(docs, b_reps=50, seed="t").collect()[0]
    assert out.asDict() == out2.asDict()


def test_bootstrap_null_difference_high_p(spark):
    # identical metrics -> every replicate sum is 0 -> all "opposing"
    docs = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("metric_a"),
        (F.col("id") % 7).alias("metric_b"))
    out = paired_bootstrap(docs, b_reps=20, seed="t").collect()[0]
    assert out.sum_delta == 0
    assert out.n_reps_zero == 20
    assert out.p_boot == pytest.approx(1.0)


def test_bootstrap_ci_order_statistics(spark):
    # mixed deltas: CI bounds must be realized replicate means with
    # lo <= observed mean <= hi and pos+neg+zero == b_reps.
    docs = spark.range(0, 25).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 13) % 9).alias("metric_a"),
        ((F.col("id") * 7) % 9).alias("metric_b"))
    out = paired_bootstrap(docs, b_reps=80, seed="ci").collect()[0]
    assert out.n_reps_pos + out.n_reps_neg + out.n_reps_zero == 80
    assert out.ci_lo <= out.mean_delta <= out.ci_hi


def test_krippendorff_alpha_cases(spark):
    from deepseek_ocr_omnidocbench_spark.operators.significance import (
        krippendorff_alpha)

    # perfect agreement over 2 values: alpha = 1
    rows = ([Row(label_a="x", label_b="x")] * 3
            + [Row(label_a="y", label_b="y")] * 2)
    out = krippendorff_alpha(spark.createDataFrame(rows)).collect()[0]
    assert out.alpha == pytest.approx(1.0)

    # hand-computed mixed case: 4 items, 1 disagreement.
    # ratings pool (2n=8): x appears 5, y appears 3 -> S = 34
    # De_scaled = 64 - 34 = 30; num = 30 - 2*1*7 = 16; alpha = 16/30
    rows = ([Row(label_a="x", label_b="x")] * 2
            + [Row(label_a="y", label_b="y")]
            + [Row(label_a="x", label_b="y")])
    out = krippendorff_alpha(spark.createDataFrame(rows)).collect()[0]
    assert (out.n, out.disagree, out.sum_sq_pooled) == (4, 1, 34)
    assert out.alpha == pytest.approx(16 / 30)

    # all ratings one value -> De_scaled = 0 -> NULL
    rows = [Row(label_a="x", label_b="x")] * 3
    out = krippendorff_alpha(spark.createDataFrame(rows)).collect()[0]
    assert out.alpha is None


def test_bootstrap_empty_input_yields_empty(spark):
    docs = spark.createDataFrame(
        [], "doc_id long, metric_a long, metric_b long")
    assert paired_bootstrap(docs, b_reps=10, seed="e").count() == 0
