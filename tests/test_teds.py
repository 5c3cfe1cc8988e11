"""TEDS tree-edit similarity (A3)."""

from deepseek_ocr_omnidocbench_spark.operators.teds import teds_score


T1 = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"


def test_identical_tables_score_1():
    assert teds_score(T1, T1) == 1.0
    assert teds_score(T1, T1, structure_only=True) == 1.0


def test_empty_cases():
    assert teds_score("", T1) == 0.0
    assert teds_score(T1, "") == 0.0
    assert teds_score("", "") == 0.0


def test_cell_text_change_partial_score():
    t2 = T1.replace("<td>d</td>", "<td>x</td>")
    s = teds_score(t2, T1)
    assert 0.5 < s < 1.0
    # structure unchanged
    assert teds_score(t2, T1, structure_only=True) == 1.0


def test_missing_row_lowers_structure_score():
    t2 = "<table><tr><td>a</td><td>b</td></tr></table>"
    s = teds_score(t2, T1, structure_only=True)
    assert 0.0 < s < 1.0


def test_colspan_counts_as_rename():
    t2 = T1.replace("<td>a</td><td>b</td>", '<td colspan="2">a</td>')
    s = teds_score(t2, T1, structure_only=True)
    assert s < 1.0


def test_th_equivalent_to_td():
    t2 = T1.replace("<td>a</td>", "<th>a</th>")
    assert teds_score(t2, T1) == 1.0


def test_monotone_in_damage():
    one = T1.replace("<td>d</td>", "<td>x</td>")
    two = one.replace("<td>c</td>", "<td>y</td>")
    assert teds_score(two, T1) <= teds_score(one, T1)
