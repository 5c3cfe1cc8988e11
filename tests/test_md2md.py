"""md2md task: both sides are markdown folders (S3)."""

import os

from deepseek_ocr_omnidocbench_spark.plans.md2md import (
    match_md2md_page,
    md2md_evaluate,
)

GT_MD = """# Heading

First paragraph of text here.

$$ E = mc^2 $$

| a | b |
| --- | --- |
| 1 | 2 |

Second paragraph follows.
"""


def test_identical_mds_score_zero():
    recs = match_md2md_page(GT_MD, GT_MD, "p")
    assert recs
    classes = {r.get("element_class") for r in recs}
    assert {"text_block", "display_formula", "reading_order"} <= classes
    for r in recs:
        # reference parity: in md2md mode GT formula spans carry raw
        # content while preds get normalized_formula (match.py:85-90 vs
        # :79-80 — the content branch skips formula normalization), so
        # identical formulas legitimately score > 0; text and tables
        # normalize symmetrically and must be exact.
        if r.get("element_class") in ("text_block", "table_html", "table_latex",
                                      "reading_order"):
            assert r["edit"] == 0.0, r


def test_perturbed_md_scores_nonzero():
    pred = GT_MD.replace("First paragraph", "Fist paragraf")
    recs = match_md2md_page(GT_MD, pred, "p")
    text = [r for r in recs if r.get("element_class") == "text_block"
            and r.get("gt_idx") is not None]
    assert any(r["edit"] > 0 for r in text)


def test_table_stream_matched_by_format():
    recs = match_md2md_page(GT_MD, GT_MD, "p")
    tables = [r for r in recs if r.get("element_class", "").startswith("table")]
    assert len(tables) == 1  # pipe table converts to html on both sides
    assert tables[0]["edit"] == 0.0


def test_md2md_evaluate_folders(spark, tmp_path):
    gt_dir, pred_dir = tmp_path / "gt", tmp_path / "pred"
    os.makedirs(gt_dir), os.makedirs(pred_dir)
    for i in range(4):
        body = GT_MD.replace("First", "Page%d first" % i)
        (gt_dir / ("page%d.md" % i)).write_text(body)
        pred_body = body if i % 2 == 0 else body.replace("paragraph", "paragrph")
        (pred_dir / ("page%d.md" % i)).write_text(pred_body)
    res = md2md_evaluate(spark, str(gt_dir), str(pred_dir))
    assert res["n_pages"] == 4
    tb = res["edit_dist"]["text_block"]
    assert 0.0 < tb["page_avg_edit"] < 0.2
