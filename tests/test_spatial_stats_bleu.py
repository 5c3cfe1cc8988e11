"""Spatial assignment (J8), CI/z-test stats (A13), BLEU (A4)."""

import math

from deepseek_ocr_omnidocbench_spark.functions.bleu import corpus_bleu, sentence_bleu
from deepseek_ocr_omnidocbench_spark.functions.stats import (
    two_proportion_z,
    wald_ci,
    wilson_ci,
)


def test_wald_ci():
    lo, hi = wald_ci(0.5, 100)
    assert abs(lo - (0.5 - 1.96 * 0.05)) < 1e-3
    assert abs(hi - (0.5 + 1.96 * 0.05)) < 1e-3
    assert wald_ci(0.5, 0) == (0.0, 0.0)


def test_wilson_ci_tighter_near_edges():
    wl, wh = wilson_ci(0.95, 50)
    al, ah = wald_ci(0.95, 50)
    assert wh <= 1.0 and ah <= 1.0
    assert wl < 0.95 < wh


def test_two_proportion_z_reference_regression():
    """scripts/p_test_calc.py feeds counts round(p*1000) over n=1355 to
    statsmodels' pooled two-sided z-test and reports z=-1.025, p=0.305
    (REPORT.md:92-93); the pooled formula here must reproduce that."""
    p1 = round(0.8156 * 1000) / 1355
    p2 = round(0.8423 * 1000) / 1355
    z, p = two_proportion_z(p1, 1355, p2, 1355)
    assert abs(z - 1.025) < 0.01 or abs(z + 1.025) < 0.01
    assert abs(p - 0.305) < 0.005


def test_bleu_identity_and_zero():
    assert abs(sentence_bleu("the cat sat on the mat here now",
                             "the cat sat on the mat here now") - 1.0) < 1e-9
    assert sentence_bleu("completely different words", "the cat sat") == 0.0


def test_bleu_partial_and_brevity():
    ref = "the quick brown fox jumps over the lazy dog"
    close = "the quick brown fox jumps over a lazy dog"
    short = "the quick brown fox jumps"
    assert 0 < sentence_bleu(close, ref) < 1
    s_short = sentence_bleu(short, ref)
    assert 0 <= s_short < sentence_bleu(close, ref)


def test_corpus_bleu_pools_counts():
    preds = ["the cat sat down", "a dog ran far away"]
    refs = ["the cat sat down", "a dog ran far away"]
    assert abs(corpus_bleu(preds, refs) - 1.0) < 1e-9


def test_assign_spans_to_blocks(spark):
    from deepseek_ocr_omnidocbench_spark.operators.spatial import (
        assign_spans_to_blocks,
        poly2bbox,
    )
    from pyspark.sql import functions as F

    spans = spark.createDataFrame(
        [("p1", 1, [0.0, 0.0, 10.0, 10.0]),     # inside block A
         ("p1", 2, [45.0, 45.0, 55.0, 55.0]),   # straddles A/B, more in B
         ("p1", 3, [200.0, 200.0, 210.0, 210.0])],  # no block
        ["img_id", "span_id", "bbox"])
    blocks = spark.createDataFrame(
        [("p1", 10, [0.0, 0.0, 50.0, 50.0]),
         ("p1", 20, [48.0, 48.0, 100.0, 100.0])],
        ["img_id", "block_id", "bbox"])
    got = {r["span_id"]: r["block_id"]
           for r in assign_spans_to_blocks(spans, blocks, min_overlap=0.2).collect()}
    assert got[1] == 10
    assert got[2] == 20
    assert 3 not in got

    # poly2bbox: 4-corner polygon -> bounding box
    df = spark.createDataFrame([([1.0, 2.0, 5.0, 2.0, 5.0, 9.0, 1.0, 9.0],)],
                               ["poly"])
    bb = df.select(poly2bbox(F.col("poly")).alias("b")).collect()[0]["b"]
    assert bb == [1.0, 2.0, 5.0, 9.0]
