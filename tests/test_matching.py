"""Matchers J3-J7: simple, quick (and sub-ops), no-split."""

import time

from deepseek_ocr_omnidocbench_spark.operators.matching import (
    explode_table_pred_to_text,
    match_no_split,
    match_quick,
    match_simple,
    sort_preds_inline_last,
    split_gt_arrays,
    split_pred_arrays,
)


def gt_text(anno_id, text, order, cat="text_block", attribute=None):
    return {"anno_id": anno_id, "category_type": cat, "order": float(order),
            "text": text, "latex": None, "html": None,
            "attribute": attribute or {"text_language": "en"}}


def pred_span(content, start, cat="text_all", fine=None):
    return {"category_type": cat, "position": [start, start + len(content)],
            "content": content, "fine_category_type": fine}


def test_simple_perfect_match():
    gts = [gt_text(1, "alpha beta gamma", 1), gt_text(2, "delta epsilon", 2)]
    preds = [pred_span("alpha beta gamma", 0), pred_span("delta epsilon", 20)]
    recs, residual = match_simple(gts, preds, "text_all", "p")
    assert residual is None
    assert len(recs) == 2
    assert all(r["edit"] == 0.0 for r in recs)
    assert {tuple(r["gt_idx"]) for r in recs} == {(0,), (1,)}


def test_simple_unmatched_preds_concat_residual_row():
    gts = [gt_text(1, "only one", 1)]
    preds = [pred_span("only one", 0), pred_span("extra stuff", 20)]
    recs, _ = match_simple(gts, preds, "text_all", "p")
    resid = [r for r in recs if r["gt_idx"] is None]
    assert len(resid) == 1
    assert resid[0]["pred"] == "extra stuff"
    assert resid[0]["edit"] == 1.0


def test_simple_no_preds_emits_unmatched_gts():
    gts = [gt_text(1, "abc", 1)]
    recs, _ = match_simple(gts, [], "text_all", "p")
    assert len(recs) == 1
    assert recs[0]["pred_idx"] is None and recs[0]["edit"] == 1.0


def test_simple_table_residual_explodes_to_cells():
    gts = [{"anno_id": 1, "category_type": "table", "order": 1.0,
            "html": "<table><tr><td>x</td></tr></table>", "text": None,
            "latex": None, "attribute": {}}]
    preds = [pred_span("<table><tr><td>x</td></tr></table>", 0, cat="html_table"),
             pred_span("<table><tr><td>y1</td><td>y2</td></tr></table>", 50, cat="html_table")]
    recs, residual = match_simple(gts, preds, "html_table", "p")
    assert residual is not None
    assert [r["content"] for r in residual] == ["y1", "y2"]
    assert all(r["category_type"] == "text_all" for r in residual)


def test_explode_table_skips_nested_markup():
    item = {"content": "<table><tr><td>a</td><td><b>n</b></td></tr></table>",
            "category_type": "html_table", "position": [0, 10]}
    cells = explode_table_pred_to_text(item)
    assert [c["content"] for c in cells] == ["a"]


def test_no_split_whole_page_pair():
    gts = [gt_text(1, "first block", 1), gt_text(2, "second block", 2)]
    preds = [pred_span("first block", 0), pred_span("second block", 20)]
    recs = match_no_split(gts, preds, None, "p")
    assert len(recs) == 1
    assert recs[0]["edit"] == 0.0
    assert recs[0]["gt_category_type"] == "text_merge"


def test_quick_1x1_fast_path():
    gts = [gt_text(1, "hello world", 1)]
    preds = [pred_span("hello world", 0)]
    recs = match_quick(gts, preds, None, "p")
    assert len(recs) == 1 and recs[0]["edit"] == 0.0


def test_quick_truncation_merge():
    """One GT paragraph split across two pred blocks must merge (J4c)."""
    para = "the quick brown fox jumps over the lazy dog again and again"
    cut = 30
    gts = [gt_text(1, para, 1), gt_text(2, "another paragraph of text here", 2)]
    preds = [pred_span(para[:cut], 0), pred_span(para[cut:].strip(), 40),
             pred_span("another paragraph of text here", 80)]
    recs = match_quick(gts, preds, None, "p")
    by_gt = {tuple(r["gt_idx"] or ()): r for r in recs}
    merged = by_gt.get((0,))
    assert merged is not None
    assert len(merged["pred_idx"]) == 2  # both pred pieces
    assert merged["edit"] < 0.2


def test_quick_fuzzy_rescue_many_gt_one_pred():
    """Two GT blocks concatenated into one pred (J4f rescue)."""
    g1, g2 = "alpha beta gamma delta epsilon", "zeta eta theta iota kappa"
    gts = [gt_text(1, g1, 1), gt_text(2, g2, 2)]
    preds = [pred_span(g1 + " " + g2, 0)]
    recs = match_quick(gts, preds, None, "p")
    matched = [r for r in recs if r["gt_idx"] and r["pred_idx"]]
    assert any(len(r["gt_idx"]) == 2 for r in matched)


def test_quick_ignore_category_prematch():
    gts = [gt_text(1, "main content paragraph here", 1),
           gt_text(2, "Figure 1: a caption", 2, cat="figure_caption")]
    preds = [pred_span("main content paragraph here", 0),
             pred_span("Figure 1: a caption", 40)]
    recs = match_quick(gts, preds, None, "p")
    cap = [r for r in recs if r["gt_category_type"] == "figure_caption"]
    assert len(cap) == 1 and cap[0]["edit"] < 0.25


def test_quick_weak_pairs_rejected():
    gts = [gt_text(1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", 1),
           gt_text(2, "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbb", 2)]
    preds = [pred_span("cccccccccccccccccccccccccccccc", 0),
             pred_span("dddddddddddddddddddddddddddddd", 40)]
    recs = match_quick(gts, preds, None, "p")
    # no accepted pair should have edit < REJECT level via false merge
    for r in recs:
        if r["gt_idx"] and r["pred_idx"]:
            assert r["edit"] >= 0.7 or r["edit"] == 1


def test_split_gt_arrays():
    items = [{"category_type": "equation_isolated", "order": 7.0,
              "latex": r"\begin{array}{l} a = b \\ c = d \end{array}",
              "attribute": {}, "anno_id": 1, "text": None, "html": None}]
    out = split_gt_arrays(items)
    assert len(out) == 2
    assert out[0]["order"] == 7.1 and out[1]["order"] == 7.2
    assert out[0]["latex"] == r"\[a = b\]"


def test_split_pred_arrays_positions():
    items = [{"category_type": "equation_isolated", "position": [10, 60],
              "content": r"\begin{array}{l} x=1 \\ y=2 \end{array}",
              "fine_category_type": None}]
    out = split_pred_arrays(items)
    assert len(out) == 2
    assert out[0]["content"] == r"\[x=1\]"
    assert out[0]["position"][0] >= 10
    assert out[1]["position"][0] > out[0]["position"][0]


def test_multicolumn_array_not_split():
    items = [{"category_type": "equation_isolated", "order": 1.0,
              "latex": r"\begin{array}{ll} a & b \end{array}",
              "attribute": {}, "anno_id": 1, "text": None, "html": None}]
    assert len(split_gt_arrays(items)) == 1


def test_sort_preds_inline_last():
    items = [pred_span("inline", 5, cat="equation_isolated", fine="equation_inline"),
             pred_span("first", 0), pred_span("second", 10)]
    out = sort_preds_inline_last(items)
    assert [i["content"] for i in out] == ["first", "second", "inline"]


def test_quick_deadline_falls_back():
    """An already-expired deadline raises MatchTimeout."""
    from deepseek_ocr_omnidocbench_spark.operators.matching import MatchTimeout

    gts = [gt_text(i, "block %d with some words" % i, i) for i in range(8)]
    preds = [pred_span("totally different %d" % i, i * 30) for i in range(8)]
    try:
        match_quick(gts, preds, None, "p", deadline=time.monotonic() - 1)
        raised = False
    except MatchTimeout:
        raised = True
    assert raised
