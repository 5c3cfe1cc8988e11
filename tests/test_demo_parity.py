"""Integration regression on the reference's real demo data: 18
annotated OmniDocBench pages + real model markdown predictions, run
through the full harness (load -> resolve -> match -> arbitrate ->
score -> report).

The committed reference result JSONs come from a *different* model run
than the demo markdown files (verified: pred table strings differ), so
exact golden-number parity with the reference is not checkable here;
instead this freezes our own deterministic scores on the real inputs as
a regression snapshot, plus structural invariants the reference's
pipeline also guarantees.
"""

import os

import pytest

DEMO_JSON = "/root/reference/OmniDocBench/demo_data/omnidocbench_demo/OmniDocBench_demo.json"
DEMO_MDS = "/root/reference/OmniDocBench/demo_data/end2end"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEMO_JSON), reason="reference demo data not present")


@pytest.fixture(scope="module")
def demo_result(spark):
    from deepseek_ocr_omnidocbench_spark.plans.evaluate import evaluate
    from deepseek_ocr_omnidocbench_spark.sources.md_folder import (
        resolve_predictions,
        scan_md_folder,
    )
    from deepseek_ocr_omnidocbench_spark.sources.omnidoc_json import (
        load_omnidoc_json,
    )

    gt, pattrs = load_omnidoc_json(spark, DEMO_JSON)
    preds = resolve_predictions(pattrs, scan_md_folder(spark, DEMO_MDS))
    assert preds.count() == 18  # every page resolves a prediction
    return evaluate(gt, preds, pattrs, method="quick_match", with_teds=True)


def test_all_streams_present(demo_result):
    assert set(demo_result["edit_dist"]) == {
        "text_block", "display_formula", "table", "reading_order"}


def test_scores_in_range(demo_result):
    for cls, row in demo_result["edit_dist"].items():
        assert 0.0 <= row["page_avg_edit"] <= 1.0, cls
        assert 0.0 <= row["edit_whole"] <= 1.0, cls
    teds = demo_result["teds"]
    assert 0.0 < teds["teds"] <= 1.0
    assert teds["teds"] <= teds["teds_structure_only"]


def test_regression_snapshot(demo_result):
    """Deterministic snapshot of the real-data run (rel tol for float
    summation order across partitions)."""
    ed = demo_result["edit_dist"]
    assert ed["text_block"]["n_samples"] == 237
    assert ed["display_formula"]["n_samples"] == 17
    assert ed["table"]["n_samples"] == 10
    assert ed["reading_order"]["n_samples"] == 18
    # values re-frozen after the pipe-table conversion became
    # byte-identical to the reference (test_reference_parity.py)
    assert ed["text_block"]["page_avg_edit"] == pytest.approx(0.341559, rel=1e-3)
    assert ed["display_formula"]["page_avg_edit"] == pytest.approx(0.319150, rel=1e-3)
    assert ed["table"]["page_avg_edit"] == pytest.approx(0.214786, rel=1e-3)
    assert ed["reading_order"]["page_avg_edit"] == pytest.approx(0.165305, rel=1e-3)
    # TEDS re-frozen after denominator + raw-cell-text parity with the
    # reference scorer (tests/test_teds_reference_parity.py: our scores
    # now equal the reference TEDS class within 1e-6 on the demo tables)
    assert demo_result["teds"]["teds"] == pytest.approx(0.783966, rel=1e-3)
    assert demo_result["teds"]["teds_structure_only"] == pytest.approx(0.911589, rel=1e-3)
    assert demo_result["overall"] == pytest.approx(70.7752, rel=1e-3)


def test_text_metrics_on_demo(demo_result):
    """BLEU + METEOR per element_class on the real demo pages (golden
    snapshot).  text_block is CJK-heavy: 13a tokenization keeps each
    Chinese run as one token (matching the reference's HF default), so
    corpus BLEU rides the Latin samples while mean-sentence METEOR sits
    low — both shapes mirror the reference's metric definitions."""
    tm = demo_result["text_metrics"]
    assert set(tm) >= {"text_block", "display_formula", "table"}
    assert tm["text_block"]["n_samples"] == 237
    assert tm["text_block"]["bleu"] == pytest.approx(0.471405, rel=1e-3)
    assert tm["text_block"]["meteor"] == pytest.approx(0.119036, rel=1e-3)
    assert tm["display_formula"]["bleu"] == pytest.approx(0.386014, rel=1e-3)
    assert tm["display_formula"]["meteor"] == pytest.approx(0.726187, rel=1e-3)
    assert tm["table"]["bleu"] == pytest.approx(0.842479, rel=1e-3)
    assert tm["table"]["meteor"] == pytest.approx(0.866260, rel=1e-3)


def test_attribute_report_has_real_labels(demo_result):
    labels = {r["attribute"] for r in demo_result["attributes"]}
    assert any("text_language" in label for label in labels)


def test_page_split_covers_demo_attributes(demo_result):
    attrs = {r["attribute"] for r in demo_result["page_split"]}
    assert "ALL" in attrs
    assert any(a.startswith("data_source:") for a in attrs)
