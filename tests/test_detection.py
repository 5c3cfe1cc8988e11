"""COCO-style detection mAP (A11): IoU matrix, greedy matching, AP."""

import numpy as np

from deepseek_ocr_omnidocbench_spark.operators.detection import (
    average_precision,
    bbox_iou_matrix,
    detection_map,
    match_image_class,
)


def test_iou_matrix():
    gt = np.array([[0, 0, 10, 10]], dtype=float)
    pred = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], dtype=float)
    iou = bbox_iou_matrix(gt, pred)
    assert iou.shape == (1, 3)
    assert abs(iou[0, 0] - 1.0) < 1e-9
    assert abs(iou[0, 1] - 25 / 175) < 1e-9
    assert iou[0, 2] == 0.0


def test_greedy_match_prefers_higher_score():
    gt = np.array([[0, 0, 10, 10]], dtype=float)
    pred = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=float)
    scores = np.array([0.5, 0.9])
    recs = match_image_class(gt, pred, scores)
    # higher-score pred (idx 1) claims the GT at IoU .5 despite lower IoU
    assert recs[1]["tp"][0] == 1 and recs[0]["tp"][0] == 0


def test_average_precision_perfect():
    ap = average_precision(np.array([0.9, 0.8]), np.array([1.0, 1.0]), n_gt=2)
    assert abs(ap - 1.0) < 1e-6
    ap0 = average_precision(np.array([0.9, 0.8]), np.array([0.0, 0.0]), n_gt=2)
    assert ap0 == 0.0


def test_average_precision_half():
    # one TP then one FP over 2 GTs: recall caps at .5, precision 1 there
    ap = average_precision(np.array([0.9, 0.8]), np.array([1.0, 0.0]), n_gt=2)
    assert 0.45 < ap < 0.55


def test_detection_map_end_to_end(spark):
    gt = spark.createDataFrame(
        [("i1", "text", [0.0, 0.0, 10.0, 10.0]),
         ("i1", "text", [20.0, 0.0, 30.0, 10.0]),
         ("i1", "table", [0.0, 20.0, 20.0, 40.0]),
         ("i2", "text", [0.0, 0.0, 10.0, 10.0])],
        ["img_id", "category", "bbox"])
    preds = spark.createDataFrame(
        [("i1", "text", [0.0, 0.0, 10.0, 10.0], 0.95),     # exact hit
         ("i1", "text", [21.0, 0.0, 30.0, 10.0], 0.9),     # near hit
         ("i1", "table", [0.0, 20.0, 20.0, 40.0], 0.8),    # exact hit
         ("i1", "text", [50.0, 50.0, 60.0, 60.0], 0.7),    # false positive
         ("i2", "text", [0.0, 0.0, 10.0, 10.0], 0.99)],
        ["img_id", "category", "bbox", "score"])
    rep = detection_map(gt, preds)
    by_cat = {r["category"]: r for _, r in rep.iterrows()}
    assert by_cat["table"]["ap50"] == 1.0
    assert by_cat["table"]["map"] == 1.0
    assert 0.8 <= by_cat["text"]["ap50"] <= 1.0
    assert by_cat["text"]["map"] < by_cat["text"]["ap50"]  # near hit fails high IoU
    assert by_cat["ALL"]["n_gt"] == 4


def test_detection_map_missing_class_prediction(spark):
    gt = spark.createDataFrame([("i1", "figure", [0.0, 0.0, 10.0, 10.0])],
                               ["img_id", "category", "bbox"])
    preds = spark.createDataFrame(
        [("i1", "figure", [100.0, 100.0, 110.0, 110.0], 0.9)],
        ["img_id", "category", "bbox", "score"])
    rep = detection_map(gt, preds)
    fig = rep[rep["category"] == "figure"].iloc[0]
    assert fig["ap50"] == 0.0 and fig["map"] == 0.0
