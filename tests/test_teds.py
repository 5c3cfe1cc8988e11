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


SPANS = ('<table><thead><tr><th rowspan="2">Cat</th><th colspan="2">Sales</th>'
         "</tr><tr><th>Q1</th><th>Q2</th></tr></thead><tbody>"
         '<tr><td rowspan="2">A</td><td>1</td><td>2</td></tr>'
         "<tr><td>3</td><td>4</td></tr></tbody></table>")


def test_gnarly_span_table_identity_and_sensitivity():
    """Span attributes are part of TEDS node identity (the reference's
    TableTree rename cost): identical span tables score 1.0, and
    changing a span value alone lowers the structure score."""
    assert teds_score(SPANS, SPANS) == 1.0
    assert teds_score(SPANS, SPANS, structure_only=True) == 1.0
    damaged = SPANS.replace('rowspan="2">A', 'rowspan="3">A')
    assert teds_score(damaged, SPANS, structure_only=True) < 1.0


def test_span_grid_agrees_with_teds_parse():
    """The TableTest grid expansion and the TEDS tree read the same
    span table consistently: every grid cell text appears in the tree."""
    from deepseek_ocr_omnidocbench_spark.operators.rule_checks import (
        parse_html_grids,
    )
    from deepseek_ocr_omnidocbench_spark.operators.teds import parse_table_tree

    grid = parse_html_grids(SPANS)[0]
    assert grid.data[3][0] == "A"  # rowspan carried down
    assert grid.data[0][2] == ""   # colspan tail empty

    texts = []

    def walk(n):
        if n.text:
            texts.append(n.text)
        for c in n.children:
            walk(c)

    walk(parse_table_tree(SPANS))
    for row in grid.data:
        for cell in row:
            if cell:
                assert any(cell in t for t in texts), cell


def test_monotone_in_damage():
    one = T1.replace("<td>d</td>", "<td>x</td>")
    two = one.replace("<td>c</td>", "<td>y</td>")
    assert teds_score(two, T1) <= teds_score(one, T1)
