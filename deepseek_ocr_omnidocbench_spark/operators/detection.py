"""Layout-detection evaluation: COCO-style mAP (SURVEY §2.6 A11).

The reference feeds per-image bbox lists to mmeval's COCODetection
(OmniDocBench/dataset/detection_dataset.py:25-32, task/detection_eval.py)
— greedy IoU matching per class plus 101-point-interpolated average
precision over IoU thresholds .50:.05:.95 (the published COCO protocol).
This is that computation from scratch, Spark-first:

* per-(image, class) matching runs in ``applyInPandas`` workers (the
  greedy score-descending IoU match is a per-group kernel, like the
  page matchers);
* the PR-curve/AP step needs the global score ranking per class, which
  is tiny (one row per detection) — aggregated driver-side exactly as
  the reference hands results to mmeval.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IOU_THRESHOLDS = [0.5 + 0.05 * i for i in range(10)]
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def bbox_iou_matrix(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """IoU of every (gt, pred) bbox pair; boxes are [x0, y0, x1, y1]."""
    if len(gt) == 0 or len(pred) == 0:
        return np.zeros((len(gt), len(pred)))
    ax0, ay0, ax1, ay1 = gt[:, 0, None], gt[:, 1, None], gt[:, 2, None], gt[:, 3, None]
    bx0, by0, bx1, by1 = pred[None, :, 0], pred[None, :, 1], pred[None, :, 2], pred[None, :, 3]
    iw = np.maximum(np.minimum(ax1, bx1) - np.maximum(ax0, bx0), 0.0)
    ih = np.maximum(np.minimum(ay1, by1) - np.maximum(ay0, by0), 0.0)
    inter = iw * ih
    area_a = np.maximum(ax1 - ax0, 0.0) * np.maximum(ay1 - ay0, 0.0)
    area_b = np.maximum(bx1 - bx0, 0.0) * np.maximum(by1 - by0, 0.0)
    union = area_a + area_b - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(union > 0, inter / union, 0.0)


def match_image_class(gt_boxes: np.ndarray, pred_boxes: np.ndarray,
                      pred_scores: np.ndarray) -> list[dict]:
    """COCO greedy matching for one (image, class): predictions in score
    order claim the best unmatched GT with IoU >= thr, per threshold.

    -> one record per prediction {score, tp: {thr: 0/1}} plus n_gt."""
    order = np.argsort(-pred_scores, kind="stable")
    iou = bbox_iou_matrix(gt_boxes, pred_boxes)
    out = []
    for thr in IOU_THRESHOLDS:
        taken = np.zeros(len(gt_boxes), dtype=bool)
        tp = np.zeros(len(pred_boxes), dtype=np.int8)
        for pi in order:
            cand = np.where(~taken & (iou[:, pi] >= thr))[0]
            if len(cand):
                best = cand[np.argmax(iou[cand, pi])]
                taken[best] = True
                tp[pi] = 1
        out.append(tp)
    return [
        {"score": float(pred_scores[pi]),
         "tp": [int(out[t][pi]) for t in range(len(IOU_THRESHOLDS))]}
        for pi in range(len(pred_boxes))
    ]


def average_precision(scores: np.ndarray, tps: np.ndarray, n_gt: int) -> float:
    """101-point interpolated AP for one class at one IoU threshold."""
    if n_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = tps[order]
    fp = 1 - tp
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1)
    # precision envelope (monotone non-increasing from the right)
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(prec_at.mean())


MATCH_SCHEMA = T.StructType([
    T.StructField("category", T.StringType()),
    T.StructField("img_id", T.StringType()),
    T.StructField("pred_idx", T.LongType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("tp", T.ArrayType(T.IntegerType())),
    T.StructField("n_gt_here", T.LongType()),
])


def detection_map(gt: DataFrame, preds: DataFrame) -> pd.DataFrame:
    """gt(img_id, category, bbox) x preds(img_id, category, bbox, score)
    -> per-class AP@0.5, AP@0.75, mAP@[.5:.95] (+ 'ALL' mean row).

    One cogroup shuffle on (img_id, category); the tiny per-detection
    records aggregate driver-side for the global PR curve."""

    def _match(key, gt_pdf: pd.DataFrame, pr_pdf: pd.DataFrame) -> pd.DataFrame:
        img, cat = str(key[0]), key[1]
        # deterministic tie-breaks: cogroup delivers rows in shuffle
        # arrival order, so "stable" sorts alone would make equal-score
        # preds (and equal-IoU gts) nondeterministic across runs — sort
        # gts by bbox and preds by (-score, bbox) so ties break
        # lexicographically, replayable by the SQL oracle
        gtb = np.asarray(list(gt_pdf["bbox"]), dtype=float) if len(gt_pdf) else np.zeros((0, 4))
        prb = np.asarray(list(pr_pdf["bbox"]), dtype=float) if len(pr_pdf) else np.zeros((0, 4))
        scores = np.asarray(pr_pdf["score"], dtype=float) if len(pr_pdf) else np.zeros(0)
        if len(gtb):
            gtb = gtb[np.lexsort(gtb.T[::-1])]
        if len(prb):
            p_order = sorted(range(len(prb)),
                             key=lambda i: (-scores[i], tuple(prb[i])))
            prb, scores = prb[p_order], scores[p_order]
        recs = match_image_class(gtb, prb, scores)
        rows = [{"category": cat, "img_id": img, "pred_idx": pi + 1,
                 "score": r["score"], "tp": r["tp"], "n_gt_here": 0}
                for pi, r in enumerate(recs)]
        rows.append({"category": cat, "img_id": img, "pred_idx": 0,
                     "score": float("nan"), "tp": None,
                     "n_gt_here": len(gt_pdf)})
        return pd.DataFrame(rows, columns=[f.name for f in MATCH_SCHEMA.fields])

    # explicit partition count: CPU-bound per-(image, class) kernels;
    # AQE's byte-based coalescing would serialize the tiny shuffle (same
    # hazard as eval_harness.match_elements; AQE respects user counts)
    n_part = gt.sparkSession.sparkContext.defaultParallelism
    matched = (
        gt.select("img_id", "category", "bbox")
        .repartition(n_part, "img_id", "category")
        .groupBy("img_id", "category")
        .cogroup(preds.select("img_id", "category", "bbox", "score")
                 .repartition(n_part, "img_id", "category")
                 .groupBy("img_id", "category"))
        .applyInPandas(_match, MATCH_SCHEMA)
    ).toPandas()

    report = []
    for cat, grp in matched.groupby("category"):
        n_gt = int(grp["n_gt_here"].sum())
        # deterministic global PR order: toPandas() row order is a
        # shuffle artifact, so tie-break equal scores on (img, pred_idx)
        dets = (grp[grp["tp"].notna()]
                .sort_values(["score", "img_id", "pred_idx"],
                             ascending=[False, True, True],
                             kind="mergesort"))
        scores = dets["score"].to_numpy(dtype=float)
        aps = []
        for t in range(len(IOU_THRESHOLDS)):
            tps = np.asarray([tp[t] for tp in dets["tp"]], dtype=float) \
                if len(dets) else np.zeros(0)
            aps.append(average_precision(scores, tps, n_gt))
        aps = np.asarray(aps)
        report.append({"category": cat, "n_gt": n_gt,
                       "ap50": round(float(aps[0]), 6),
                       "ap75": round(float(aps[5]), 6),
                       "map": round(float(np.nanmean(aps)), 6)})
    rep = pd.DataFrame(sorted(report, key=lambda r: r["category"]))
    if len(rep):
        rep = pd.concat([rep, pd.DataFrame([{
            "category": "ALL", "n_gt": int(rep["n_gt"].sum()),
            "ap50": round(float(rep["ap50"].mean()), 6),
            "ap75": round(float(rep["ap75"].mean()), 6),
            "map": round(float(rep["map"].mean()), 6),
        }])], ignore_index=True)
    return rep
