"""CDM (Character Detection Matching) match kernel — renderer-free half.

The reference scores formula recognition by rendering GT and predicted
LaTeX to images with per-token colored bboxes, then matching token boxes
(``OmniDocBench/metrics 2/cdm_metric.py:96-147``) with a Hungarian
assignment over token/position/order costs
(``metrics 2/cdm/modules/visual_matcher.py``) followed by an iterated
RANSAC affine (translation+scale) inlier filter, and reports
recall / precision / F1 of the surviving matches.

The LaTeX→bbox renderer (``cdm/modules/latex2bbox_color.py``) needs a
TeX stack + PIL and is container-blocked; everything downstream of the
boxes is pure geometry + assignment and is reimplemented here from
scratch:

- token-cost semantics per ``visual_matcher.py:calculate_token_cost``
  (0 exact, 0.05 normalized-equal, 1 otherwise) with the
  ``norm_same_token`` LaTeX normalization table;
- L1 position cost over size-normalized boxes and order cost over
  rank/len, combined 1·token + 0.05·position + 0.15·order
  (``visual_matcher.py:HungarianMatcher.__call__``);
- assignment via our own Jonker-Volgenant kernel
  (``functions/hungarian.py``) instead of scipy;
- a from-scratch deterministic RANSAC over a translation+scale model
  (``SimpleAffineTransform`` semantics: residual = euclidean distance
  after centering-scale-translate) with the reference's parameters
  (min_samples=3, residual_threshold=25, max_trials=50, up to 3
  passes over remaining outliers, ``cdm_metric.py:107-135``).  The
  reference delegates sampling to ``skimage.measure.ransac`` with
  random_state=42; our sampler is a seeded ``numpy`` Generator, so
  inlier sets can differ on genuinely ambiguous geometry — on the
  clean / clearly-outlier fixtures the tests use, both converge to the
  same consensus set.  Final token-mismatch inlier filter and
  recall/precision/F1 per ``cdm_metric.py:137-147``.

The Spark surface is ``cdm_match_report``: token boxes as ROWS
(formula_id, side, idx, token, bbox, img size) → one
``applyInPandas`` cogroup-free groupBy per formula — each formula's
boxes are a few dozen rows, so the per-group kernel is tiny and the
shuffle key (formula_id) is naturally high-cardinality at corpus
scale.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hungarian import linear_sum_assignment

# ---------------------------------------------------------------------------
# token normalization (visual_matcher.py:norm_same_token)

_SPECIAL_TOKEN_MAP = {
    "\\cdot": ".",
    "\\mid": "|",
    "\\to": "\\rightarrow",
    "\\top": "T",
    "\\Tilde": "\\tilde",
    "\\cdots": "\\dots",
    "\\prime": "'",
    "\\ast": "*",
    "\\left<": "\\langle",
    "\\right>": "\\rangle",
}


def norm_same_token(token: str) -> str:
    """LaTeX token equivalence-class key (visual_matcher.py:44-80)."""
    token = _SPECIAL_TOKEN_MAP.get(token, token)
    if token.startswith("\\left") or token.startswith("\\right"):
        token = token.replace("\\left", "").replace("\\right", "")
    if token.startswith("\\big") or token.startswith("\\Big"):
        rest = token[4:]
        token = "\\" + rest.split("\\")[-1] if "\\" in rest else token[-1]
    if token in ("\\leq", "\\geq"):
        return token[:-1]
    if token in ("\\lVert", "\\rVert", "\\Vert"):
        return "\\|"
    if token in ("\\lvert", "\\rvert", "\\vert"):
        return "|"
    if token.endswith("rightarrow"):
        return "\\rightarrow"
    if token.endswith("leftarrow"):
        return "\\leftarrow"
    if token.startswith("\\wide"):
        return token.replace("wide", "")
    if token.startswith("\\var"):
        return token.replace("\\var", "")
    return token


# ---------------------------------------------------------------------------
# cost matrices + Hungarian (visual_matcher.py:HungarianMatcher)

COST_TOKEN, COST_POSITION, COST_ORDER = 1.0, 0.05, 0.15


def _token_cost(gt_tokens: list[str], pred_tokens: list[str]) -> np.ndarray:
    """(n_gt, n_pred): 0 exact match, 0.05 normalized match, 1 else."""
    gt = np.array(gt_tokens, dtype=object)
    pr = np.array(pred_tokens, dtype=object)
    exact = gt[:, None] == pr[None, :]
    gt_n = np.array([norm_same_token(t) for t in gt_tokens], dtype=object)
    pr_n = np.array([norm_same_token(t) for t in pred_tokens], dtype=object)
    normed = gt_n[:, None] == pr_n[None, :]
    cost = np.ones((len(gt_tokens), len(pred_tokens)))
    cost[normed] = 0.05
    cost[exact] = 0.0
    return cost


def _l1_cost(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise L1 / n_dims (visual_matcher.py:calculate_l1_cost)."""
    return np.abs(a[:, None, :] - b[None, :, :]).sum(axis=2) / a.shape[-1]


def _norm_boxes(boxes: np.ndarray, size: tuple[float, float]) -> np.ndarray:
    w, h = size
    return boxes / np.array([w, h, w, h], dtype=np.float64)


def cdm_assign(gt_tokens, gt_boxes, gt_size, pred_tokens, pred_boxes,
               pred_size):
    """Hungarian match of token boxes.  Returns (pairs, token_cost) where
    pairs is a list of (gt_idx, pred_idx)."""
    n_gt, n_pred = len(gt_tokens), len(pred_tokens)
    if n_gt == 0 or n_pred == 0:
        return [], np.zeros((n_gt, n_pred))
    token = _token_cost(gt_tokens, pred_tokens)
    position = _l1_cost(_norm_boxes(np.asarray(gt_boxes, float), gt_size),
                        _norm_boxes(np.asarray(pred_boxes, float), pred_size))
    order = _l1_cost(np.arange(n_gt, dtype=float)[:, None] / n_gt,
                     np.arange(n_pred, dtype=float)[:, None] / n_pred)
    cost = COST_TOKEN * token + COST_POSITION * position + COST_ORDER * order
    cost[np.isnan(cost) | np.isinf(cost)] = 100.0
    rows, cols = linear_sum_assignment(cost)
    return list(zip(rows.tolist(), cols.tolist())), token


# ---------------------------------------------------------------------------
# translation+scale model + deterministic RANSAC (cdm_metric.py:107-135)

class SimpleAffine:
    """Translation + isotropic scale about the source centroid
    (visual_matcher.py:SimpleAffineTransform)."""

    def __init__(self) -> None:
        self.translation = np.zeros(2)
        self.scale = 1.0
        self.src_center = np.zeros(2)

    def estimate(self, src: np.ndarray, dst: np.ndarray) -> bool:
        self.src_center = src.mean(axis=0)
        dst_center = dst.mean(axis=0)
        self.translation = dst_center - self.src_center
        src_d = np.linalg.norm(src - self.src_center, axis=1)
        dst_d = np.linalg.norm(dst - dst_center, axis=1)
        self.scale = dst_d.mean() / (src_d.mean() + 1e-10)
        return True

    def residuals(self, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        # NOTE the reference applies the scale about the *query* batch's
        # own centroid (visual_matcher.py:__call__ uses np.mean(coords));
        # we keep the fit centroid, which is the standard formulation and
        # identical whenever residuals are evaluated on the fit batch.
        mapped = self.scale * (src - self.src_center) + self.src_center \
            + self.translation
        return np.sqrt(((mapped - dst) ** 2).sum(axis=1))


def ransac_translation_scale(src: np.ndarray, dst: np.ndarray,
                             min_samples: int = 3,
                             residual_threshold: float = 25.0,
                             max_trials: int = 50,
                             seed: int = 42) -> Optional[np.ndarray]:
    """Deterministic RANSAC consensus for the translation+scale model.
    Returns a boolean inlier mask (or None when degenerate)."""
    n = src.shape[0]
    if n < min_samples:
        return None
    rng = np.random.default_rng(seed)
    best_mask: Optional[np.ndarray] = None
    best_count = 0
    model = SimpleAffine()
    for _ in range(max_trials):
        pick = rng.choice(n, size=min_samples, replace=False)
        model.estimate(src[pick], dst[pick])
        mask = model.residuals(src, dst) < residual_threshold
        count = int(mask.sum())
        if count > best_count:
            best_count, best_mask = count, mask
            if count == n:
                break
    if best_mask is None or best_count < min_samples:
        return None
    # refit on the consensus set, like skimage's final re-estimate
    model.estimate(src[best_mask], dst[best_mask])
    final = model.residuals(src, dst) < residual_threshold
    return final if final.sum() >= min_samples else best_mask


def _iterated_inliers(src: np.ndarray, dst: np.ndarray,
                      max_iter: int = 3, min_samples: int = 3,
                      residual_threshold: float = 25.0,
                      max_trials: int = 50) -> np.ndarray:
    """The reference's outer loop (cdm_metric.py:113-135): run RANSAC on
    the still-unmatched points up to max_iter times, merging inlier sets
    — formulas can have several consistent sub-layouts (e.g. a split
    fraction) each with its own translation."""
    n = src.shape[0]
    if n <= min_samples:
        return np.ones(n, dtype=bool)
    inliers = np.zeros(n, dtype=bool)
    for it in range(max_iter):
        rest = ~inliers
        if src[rest].shape[0] <= min_samples:
            break
        sub = ransac_translation_scale(
            src[rest], dst[rest], min_samples=min_samples,
            residual_threshold=residual_threshold, max_trials=max_trials,
            seed=42 + it)
        if sub is None or not sub.any():
            break
        inliers[np.flatnonzero(rest)[sub]] = True
        if inliers.sum() >= n:
            break
    return inliers


def cdm_page_scores(gt_tokens, gt_boxes, gt_size,
                    pred_tokens, pred_boxes, pred_size) -> dict:
    """Full renderer-free CDM for one formula: Hungarian match → iterated
    RANSAC inlier filter → token-mismatch drop → R/P/F1
    (cdm_metric.py:96-147, rounding per _calculate_metrics)."""
    pairs, token_cost = cdm_assign(gt_tokens, gt_boxes, gt_size,
                                   pred_tokens, pred_boxes, pred_size)
    n_gt, n_pred = len(gt_tokens), len(pred_tokens)
    if not pairs:
        return {"n_gt": n_gt, "n_pred": n_pred, "n_match": 0,
                "recall": 0.0, "precision": 0.0, "f1": 0.0}
    gt_b = np.asarray(gt_boxes, float)
    pred_b = np.asarray(pred_boxes, float)
    # match-point = box center in (y, x) order (cdm_metric.py:100-106)
    src = np.array([[(gt_b[a][1] + gt_b[a][3]) / 2.0,
                     (gt_b[a][0] + gt_b[a][2]) / 2.0] for a, _ in pairs])
    dst = np.array([[(pred_b[b][1] + pred_b[b][3]) / 2.0,
                     (pred_b[b][0] + pred_b[b][2]) / 2.0] for _, b in pairs])
    inliers = _iterated_inliers(src, dst)
    for idx, (a, b) in enumerate(pairs):
        if inliers[idx] and token_cost[a, b] == 1:
            inliers[idx] = False
    n_match = int(inliers.sum())
    return {
        "n_gt": n_gt, "n_pred": n_pred, "n_match": n_match,
        "recall": round(n_match / n_gt, 3),
        "precision": round(n_match / n_pred, 3),
        "f1": round(2 * n_match / (n_gt + n_pred), 3),
    }


# ---------------------------------------------------------------------------
# Spark surface

CDM_BOX_SCHEMA = ("formula_id string, side string, idx int, token string, "
                  "x_min double, y_min double, x_max double, y_max double, "
                  "img_w double, img_h double")

CDM_REPORT_SCHEMA = ("formula_id string, n_gt int, n_pred int, n_match int, "
                     "recall double, precision double, f1 double")


def cdm_match_report(boxes: DataFrame) -> DataFrame:
    """Per-formula CDM scores from a token-box table (CDM_BOX_SCHEMA:
    one row per rendered token, side ∈ {gt, pred}).

    Scale shape: groupBy(formula_id) → applyInPandas.  formula_id is the
    natural high-cardinality shuffle key (millions of formulas, dozens
    of boxes each); the per-group kernel is O(k^3) Hungarian on k≈tokens
    per formula, bounded by formula length, so no group can pin a task.
    """
    import pandas as pd

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("idx")
        gt = pdf[pdf["side"] == "gt"]
        pr = pdf[pdf["side"] == "pred"]

        def unpack(part):
            toks = part["token"].tolist()
            bxs = part[["x_min", "y_min", "x_max", "y_max"]].to_numpy()
            if len(part):
                size = (float(part["img_w"].iloc[0]),
                        float(part["img_h"].iloc[0]))
            else:
                size = (1.0, 1.0)
            return toks, bxs, size

        g_t, g_b, g_s = unpack(gt)
        p_t, p_b, p_s = unpack(pr)
        s = cdm_page_scores(g_t, g_b, g_s, p_t, p_b, p_s)
        return pd.DataFrame([{
            "formula_id": pdf["formula_id"].iloc[0], **s}])

    # explicit partition count: the per-formula kernel is CPU-bound and
    # AQE's byte-based coalescing would serialize the tiny shuffle (same
    # hazard as eval_harness.match_elements; AQE respects user counts)
    n_part = boxes.sparkSession.sparkContext.defaultParallelism
    return (boxes.repartition(n_part, "formula_id")
            .groupBy("formula_id")
            .applyInPandas(score, schema=CDM_REPORT_SCHEMA))


def synthetic_formula_boxes(spark, n_formulas: int = 40,
                            seed: int = 11) -> DataFrame:
    """Deterministic token-box fixture standing in for the
    container-blocked LaTeX renderer: per formula, GT boxes laid out on
    a line; pred = affine(translation+scale) image of GT with planted
    token substitutions, dropped tokens, and spurious extra boxes, so
    expected n_match is computable in the tests."""
    tokens = ["x", "+", "y", "=", "\\alpha", "\\cdot", "z", "2", "(", ")",
              "\\sum", "a", "b", "-", "\\frac"]
    rows = []
    rng = np.random.default_rng(seed)
    for f in range(n_formulas):
        k = 5 + int(rng.integers(0, 8))
        toks = [tokens[int(rng.integers(0, len(tokens)))] for _ in range(k)]
        scale = 0.8 + 0.4 * float(rng.random())
        tx, ty = float(rng.integers(-30, 30)), float(rng.integers(-10, 10))
        n_drop = int(rng.integers(0, 2))
        for i, t in enumerate(toks):
            x0, y0 = 10.0 + 22.0 * i, 40.0
            rows.append((f"f{f}", "gt", i, t, x0, y0, x0 + 18.0, y0 + 24.0,
                         600.0, 100.0))
        j = 0
        for i, t in enumerate(toks):
            if i < n_drop:          # dropped token → recall loss
                continue
            pt = t if rng.random() > 0.1 else "\\beta"  # substitution
            x0 = (10.0 + 22.0 * i) * scale + tx
            y0 = 40.0 * scale + ty
            rows.append((f"f{f}", "pred", j, pt, x0, y0,
                         x0 + 18.0 * scale, y0 + 24.0 * scale, 600.0, 100.0))
            j += 1
        if rng.random() < 0.3:      # spurious extra box → precision loss
            rows.append((f"f{f}", "pred", j, "q", 500.0, 70.0, 518.0, 94.0,
                         600.0, 100.0))
    return spark.createDataFrame(rows, CDM_BOX_SCHEMA)
