"""Renderer-free CDM match kernel (J10/A5 — cdm_metric.py:96-147)."""

import numpy as np
import pytest

from deepseek_ocr_omnidocbench_spark.operators.cdm_match import (
    SimpleAffine,
    cdm_assign,
    cdm_match_report,
    cdm_page_scores,
    norm_same_token,
    ransac_translation_scale,
    synthetic_formula_boxes,
)


def _line_boxes(n, x0=10.0, step=22.0, y=40.0, w=18.0, h=24.0,
                scale=1.0, tx=0.0, ty=0.0):
    return [[(x0 + step * i) * scale + tx, y * scale + ty,
             (x0 + step * i + w) * scale + tx, (y + h) * scale + ty]
            for i in range(n)]


def test_norm_same_token_table():
    assert norm_same_token("\\cdot") == "."
    assert norm_same_token("\\leq") == "\\le"
    assert norm_same_token("\\lVert") == "\\|"
    assert norm_same_token("\\longrightarrow") == "\\rightarrow"
    assert norm_same_token("\\left(") == "("
    assert norm_same_token("\\bigl\\langle") == "\\langle"
    assert norm_same_token("\\widehat") == "\\hat"
    # the reference strips "\var" wholesale (visual_matcher.py:78-79),
    # leaving a bare name — kept bug-for-bug for parity
    assert norm_same_token("\\varepsilon") == "epsilon"
    assert norm_same_token("x") == "x"


def test_assign_identity():
    toks = ["x", "+", "y"]
    boxes = _line_boxes(3)
    pairs, token_cost = cdm_assign(toks, boxes, (600, 100),
                                   toks, boxes, (600, 100))
    assert pairs == [(0, 0), (1, 1), (2, 2)]
    assert np.diag(token_cost).tolist() == [0.0, 0.0, 0.0]


def test_assign_prefers_position_among_equal_tokens():
    # two identical tokens — assignment must follow geometry, not order
    toks = ["x", "x"]
    gt = _line_boxes(2)
    pred = [gt[1], gt[0]]  # swapped
    pairs, _ = cdm_assign(toks, gt, (600, 100), toks, pred, (600, 100))
    # position cost dominates order cost (0.05*pos vs 0.15*order at this
    # distance): order cost difference is 0.15*(1/2)=0.075 per pair while
    # position cost difference is 0.05*(2*22/600)/4≈0.0018 — order wins
    # here, matching the reference's weighting
    assert pairs == [(0, 0), (1, 1)]


def test_perfect_formula_scores_one():
    toks = ["x", "+", "y", "=", "z"]
    s = cdm_page_scores(toks, _line_boxes(5), (600, 100),
                        toks, _line_boxes(5, scale=0.9, tx=12, ty=3),
                        (600, 100))
    assert s == {"n_gt": 5, "n_pred": 5, "n_match": 5,
                 "recall": 1.0, "precision": 1.0, "f1": 1.0}


def test_token_mismatch_dropped_from_inliers():
    """One substituted token (cost 1) at the right position must not
    count as matched (cdm_metric.py:137-140)."""
    gt = ["x", "+", "y", "=", "z", "a"]
    pred = ["x", "+", "\\beta", "=", "z", "a"]
    s = cdm_page_scores(gt, _line_boxes(6), (600, 100),
                        pred, _line_boxes(6), (600, 100))
    assert s["n_match"] == 5
    assert s["recall"] == round(5 / 6, 3)
    assert s["precision"] == round(5 / 6, 3)
    assert s["f1"] == round(10 / 12, 3)


def test_normalized_token_counts_as_match():
    gt = ["\\cdot", "x", "\\leq", "y", "\\lVert"]
    pred = [".", "x", "\\le", "y", "\\|"]
    s = cdm_page_scores(gt, _line_boxes(5), (600, 100),
                        pred, _line_boxes(5), (600, 100))
    assert s["n_match"] == 5 and s["f1"] == 1.0


def test_missing_and_spurious_boxes():
    gt = ["a", "b", "c", "d", "e", "f"]
    gt_boxes = _line_boxes(6)
    # pred drops 'a' and appends a far-away spurious 'q'
    pred = ["b", "c", "d", "e", "f", "q"]
    pred_boxes = gt_boxes[1:] + [[500.0, 70.0, 518.0, 94.0]]
    s = cdm_page_scores(gt, gt_boxes, (600, 100),
                        pred, pred_boxes, (600, 100))
    assert s["n_match"] == 5
    assert s["recall"] == round(5 / 6, 3)
    assert s["precision"] == round(5 / 6, 3)


def test_ransac_rejects_displaced_outliers():
    """Points following one translation, plus 3 matched far off it —
    RANSAC must keep the consistent 12 and drop the 3 (residual 200 ≫
    threshold 25)."""
    rng = np.random.default_rng(3)
    src = rng.uniform(0, 400, size=(15, 2))
    dst = src + np.array([30.0, 10.0])
    dst[12:] += 200.0
    mask = ransac_translation_scale(src, dst)
    assert mask is not None
    assert mask[:12].all() and not mask[12:].any()


def test_iterated_ransac_two_sublayouts():
    """Two halves with different translations (a split formula): the
    max_iter=3 outer loop must recover BOTH as inliers even though no
    single affine fits them (cdm_metric.py:113-135)."""
    gt = [str(i) for i in range(12)]
    gt_boxes = _line_boxes(12)
    pred_boxes = (_line_boxes(6, tx=5, ty=3)
                  + _line_boxes(12, tx=-140, ty=60)[6:])
    s = cdm_page_scores(gt, gt_boxes, (600, 200),
                        gt, pred_boxes, (600, 200))
    assert s["n_match"] == 12 and s["f1"] == 1.0


def test_empty_sides():
    s = cdm_page_scores([], [], (600, 100), ["x"],
                        _line_boxes(1), (600, 100))
    assert s == {"n_gt": 0, "n_pred": 1, "n_match": 0,
                 "recall": 0.0, "precision": 0.0, "f1": 0.0}


def test_affine_estimate_roundtrip():
    rng = np.random.default_rng(9)
    src = rng.uniform(0, 100, size=(8, 2))
    dst = 1.3 * (src - src.mean(axis=0)) + src.mean(axis=0) + [7.0, -4.0]
    m = SimpleAffine()
    m.estimate(src, dst)
    assert abs(m.scale - 1.3) < 1e-9
    assert np.allclose(m.residuals(src, dst), 0.0, atol=1e-9)


def test_spark_report_matches_local_kernel(spark):
    boxes = synthetic_formula_boxes(spark, n_formulas=25)
    got = {r["formula_id"]: r.asDict() for r in cdm_match_report(boxes).collect()}
    assert len(got) == 25
    pdf = boxes.toPandas()
    for fid, grp in pdf.groupby("formula_id"):
        grp = grp.sort_values("idx")
        gt = grp[grp.side == "gt"]
        pr = grp[grp.side == "pred"]
        want = cdm_page_scores(
            gt.token.tolist(),
            gt[["x_min", "y_min", "x_max", "y_max"]].to_numpy(),
            (600.0, 100.0),
            pr.token.tolist(),
            pr[["x_min", "y_min", "x_max", "y_max"]].to_numpy(),
            (600.0, 100.0))
        row = got[fid]
        for k, v in want.items():
            assert row[k] == pytest.approx(v), (fid, k)
    # the fixture plants real recall/precision losses — scores vary
    f1s = {round(v["f1"], 3) for v in got.values()}
    assert len(f1s) > 1 and max(f1s) == 1.0
