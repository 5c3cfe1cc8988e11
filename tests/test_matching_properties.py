"""Property-based tests for the matchers: structural invariants that
must hold for ANY page (SURVEY §5 plan item c — the reference has no
property tests; these guard the many interacting quick-match sub-ops)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_omnidocbench_spark.operators.matching import (
    match_no_split,
    match_quick,
    match_simple,
)

WORDS = ["alpha", "beta", "gamma", "delta", "data", "spark", "table",
         "value", "metric", "result", "分布", "式系统"]


@st.composite
def page(draw):
    n_gt = draw(st.integers(0, 6))
    n_pred = draw(st.integers(0, 6))
    gts = []
    for i in range(n_gt):
        words = draw(st.lists(st.sampled_from(WORDS), min_size=1, max_size=8))
        cat = draw(st.sampled_from(["text_block", "title", "figure_caption"]))
        gts.append({"anno_id": i + 1, "category_type": cat,
                    "order": float(i + 1), "text": " ".join(words),
                    "latex": None, "html": None, "attribute": {"k": "v"}})
    preds = []
    pos = 0
    for _ in range(n_pred):
        words = draw(st.lists(st.sampled_from(WORDS), min_size=1, max_size=8))
        content = " ".join(words)
        preds.append({"category_type": "text_all",
                      "position": [pos, pos + len(content)],
                      "content": content, "fine_category_type": "text_block"})
        pos += len(content) + 2
    return gts, preds


def check_invariants(records, n_gt_kept):
    seen_gt = []
    for r in records:
        assert 0.0 <= r["edit"] <= 1.0
        if r["gt_idx"] is not None:
            for g in r["gt_idx"]:
                seen_gt.append(g)
        # a record must reference at least one side
        assert r["gt_idx"] is not None or r["pred_idx"] is not None
    # every kept GT line appears exactly once across records
    assert sorted(seen_gt) == sorted(set(seen_gt))
    assert len(set(seen_gt)) == n_gt_kept


@given(page())
@settings(max_examples=60, deadline=None)
def test_simple_invariants(p):
    gts, preds = p
    records, _resid = match_simple(gts, preds, "text_all", "img")
    check_invariants(records, len([g for g in gts if g["text"]]))


@given(page())
@settings(max_examples=60, deadline=None)
def test_quick_invariants(p):
    gts, preds = p
    records = match_quick(gts, preds, None, "img")
    n_kept = len([g for g in gts if g["text"]])
    check_invariants(records, n_kept)


@given(page())
@settings(max_examples=40, deadline=None)
def test_no_split_single_record(p):
    gts, preds = p
    records = match_no_split(gts, preds, None, "img")
    assert len(records) <= 1
    if records:
        assert 0.0 <= records[0]["edit"] <= 1.0


@given(page())
@settings(max_examples=40, deadline=None)
def test_quick_deterministic(p):
    gts, preds = p
    a = match_quick([dict(g) for g in gts], [dict(x) for x in preds], None, "img")
    b = match_quick([dict(g) for g in gts], [dict(x) for x in preds], None, "img")
    assert a == b
