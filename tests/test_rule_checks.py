"""Rule-based output checks (olmocr bench/tests.py port) — expected
verdicts replicated from the reference's own tests/test_tests.py."""

import pytest

from deepseek_ocr_omnidocbench_spark.operators.rule_checks import (
    check_baseline,
    check_math,
    check_order,
    check_presence,
    check_table,
    indel_ratio,
    normalize_check_text,
    parse_html_grids,
    parse_markdown_grids,
    run_check,
)

MD_TABLE = """
| Header 1 | Header 2 | Header 3 |
| -------- | -------- | -------- |
| Cell A1  | Cell A2  | Cell A3  |
| Cell B1  | Cell B2  | Cell B3  |
"""

HTML_TABLE = """
<table>
  <tr><th>Header 1</th><th>Header 2</th><th>Header 3</th></tr>
  <tr><td>Cell A1</td><td>Cell A2</td><td>Cell A3</td></tr>
  <tr><td>Cell B1</td><td>Cell B2</td><td>Cell B3</td></tr>
</table>
"""

SPAN_TABLE = """<table>
  <thead>
    <tr>
      <th rowspan="2">Product Category</th>
      <th rowspan="2">Product Subcategory</th>
      <th colspan="4">Quarterly Sales ($000s)</th>
      <th rowspan="2">Annual Total</th>
    </tr>
    <tr><th>Q1</th><th>Q2</th><th>Q3</th><th>Q4</th></tr>
  </thead>
  <tbody>
    <tr><td rowspan="4">Electronics</td><td>Smartphones</td>
        <td>245</td><td>278</td><td>312</td><td>389</td><td>1,224</td></tr>
    <tr><td>Laptops</td><td>187</td><td>192</td><td>243</td><td>297</td><td>919</td></tr>
    <tr><td>Tablets</td><td>95</td><td>123</td><td>135</td><td>156</td><td>509</td></tr>
    <tr><td>Accessories</td><td>64</td><td>72</td><td>87</td><td>105</td><td>328</td></tr>
    <tr><td rowspan="3">Home Appliances</td><td>Refrigerators</td>
        <td>132</td><td>145</td><td>151</td><td>162</td><td>590</td></tr>
    <tr><td>Washing Machines</td><td>98</td><td>112</td><td>127</td><td>143</td><td>480</td></tr>
    <tr><td>Microwaves</td><td>54</td><td>67</td><td>72</td><td>84</td><td>277</td></tr>
    <tr><td colspan="2">Quarterly Totals</td>
        <td>1,150</td><td>1,296</td><td>1,456</td><td>1,712</td><td>5,614</td></tr>
  </tbody>
</table>"""


# -- normalize_text (reference test_tests.py:19-63) -------------------------

def test_normalize_whitespace():
    assert normalize_check_text("This  has\tmultiple    spaces\nand\nnewlines") \
        == "This has multiple spaces and newlines"


def test_normalize_fancy_chars():
    assert normalize_check_text("This has 'fancy' “quotes” and—dashes") \
        == "This has 'fancy' \"quotes\" and-dashes"


def test_normalize_markdown():
    assert normalize_check_text("this is *bold*") == "this is bold"
    assert normalize_check_text("_italic__ is *bold*") == "italic_ is bold"


def test_normalize_brs():
    assert normalize_check_text("Hello<br>everyone") == "Hello everyone"
    assert normalize_check_text("Hello<br/>everyone") \
        == normalize_check_text("Hello\neveryone")


# -- presence (test_tests.py:134-232) ---------------------------------------

def test_present_exact():
    assert check_presence("This is some target text in a document", "target text")[0]


def test_present_not_found():
    ok, why = check_presence("This document doesn't have the target", "missing text")
    assert not ok and "missing text" in why


def test_present_max_diffs():
    assert check_presence("This is some targett textt in a document",
                          "target text", max_diffs=2)[0]


def test_absent_found_and_diffs():
    assert not check_presence("This is some target text in a document",
                              "target text", absent=True)[0]
    for body, want in [("This is some target text in a document", False),
                       ("This is some targett text in a document", False),
                       ("This is some targettt text in a document", False),
                       ("This is some targetttt text in a document", True)]:
        got = check_presence(body, "target text", absent=True, max_diffs=2)[0]
        assert got == want, body


def test_absent_not_found():
    assert check_presence("This document doesn't have the target",
                          "missing text", absent=True)[0]


def test_case_insensitive():
    assert check_presence("This is some target text in a document",
                          "TARGET TEXT", case_sensitive=False)[0]
    assert not check_presence("This is some target text in a document",
                              "TARGET TEXT", absent=True, case_sensitive=False)[0]


def test_first_last_n():
    body = "beginning of text, but not the end"
    assert check_presence(body, "beginning", first_n=20)[0]
    assert not check_presence(body, "end", first_n=20)[0]
    assert check_presence(body, "end", last_n=20)[0]
    assert not check_presence(body, "beginning", last_n=20)[0]
    both = "beginning of text, middle part, but not the end"
    assert check_presence(both, "beginning", first_n=15, last_n=10)[0]
    assert not check_presence(both, "middle", first_n=15, last_n=10)[0]


def test_unicode_nfc():
    q = "I like to eat at a café"
    assert check_presence("I like to eat at a café", q)[0]
    assert check_presence("I like to eat at a café", q)[0]


# -- order (test_tests.py:257-296) ------------------------------------------

def test_order_verdicts():
    body = "This has first and then second in correct order"
    assert check_order(body, "first", "second")[0]
    assert not check_order(body, "second", "first")[0]
    assert not check_order("This text has present but not the other word",
                           "missing", "present")[0]
    assert not check_order("This text has present but not the other word",
                           "present", "missing")[0]
    assert check_order("This has firsst and then secand in correct order",
                       "first", "second", max_diffs=1)[0]
    assert check_order("This has target and then target again",
                       "target", "target")[0]
    assert check_order("A B A B", "B", "A")[0]


# -- tables (test_tests.py:346-470 + rowspan/colspan 752-900) ---------------

def test_parse_markdown_grid_shape():
    grids = parse_markdown_grids(MD_TABLE)
    assert len(grids) == 1
    g = grids[0]
    assert len(g.data) == 3 and len(g.data[0]) == 3
    assert g.data[0][0] == "Header 1"
    assert g.data[1][1] == "Cell A2"
    assert g.data[2][2] == "Cell B3"


def test_parse_html_grid_shape():
    grids = parse_html_grids(HTML_TABLE)
    assert len(grids) == 1
    g = grids[0]
    assert len(g.data) == 3 and len(g.data[0]) == 3
    assert g.data[0][0] == "Header 1"
    assert g.data[1][1] == "Cell A2"
    assert g.data[2][2] == "Cell B3"


def test_table_cell_and_relations():
    assert check_table(MD_TABLE, "Cell A2")[0]
    ok, why = check_table(MD_TABLE, "Missing Cell")
    assert not ok and "no cell matching" in why.lower()
    assert check_table(MD_TABLE, "Cell A2", up="Header 2")[0]
    assert not check_table(MD_TABLE, "Cell A2", up="Wrong Header")[0]
    assert check_table(MD_TABLE, "Cell A2", down="Cell B2")[0]
    assert not check_table(MD_TABLE, "Cell A2", down="Wrong Cell")[0]
    assert check_table(MD_TABLE, "Cell A2", left="Cell A1")[0]
    assert check_table(MD_TABLE, "Cell A2", right="Cell A3")[0]
    assert check_table(MD_TABLE, "Cell B2", top_heading="Header 2")[0]
    assert check_table(HTML_TABLE, "Cell A2", up="Header 2", down="Cell B2",
                       left="Cell A1", right="Cell A3")[0]


def test_span_grid_expansion():
    """Reference expansion (tests.py:368-377): rowspan text fills the
    directly-below cells, other spanned positions become ''."""
    g = parse_html_grids(SPAN_TABLE)[0]
    assert g.data[2][0] == "Electronics"  # rowspan carried down col 0
    assert g.data[3][0] == "Electronics"
    assert g.data[0][3] == ""  # colspan tail of Quarterly Sales is empty
    assert g.data[9][1] == ""  # colspan tail of Quarterly Totals
    assert 0 in g.header_rows and 1 in g.header_rows


def test_span_table_relations():
    for cell in ("Refrigerators", "Washing Machines", "Microwaves"):
        ok, why = check_table(SPAN_TABLE, cell, left="Home Appliances")
        assert ok, (cell, why)
    ok, why = check_table(SPAN_TABLE, "Tablets", top_heading="Product Subcategory")
    assert ok, why
    ok, why = check_table(SPAN_TABLE, "135", top_heading="Q3")
    assert ok, why
    ok, why = check_table(SPAN_TABLE, "135", top_heading="Quarterly Sales ($000s)")
    assert ok, why
    ok, why = check_table(SPAN_TABLE, "1,712", top_heading="Quarterly Sales ($000s)")
    assert ok, why
    assert not check_table(SPAN_TABLE, "135", top_heading="Q2")[0]
    assert not check_table(SPAN_TABLE, "135", top_heading="Q1")[0]


def test_multiline_rowspan_down():
    table = """<table><tbody>
      <tr><td rowspan="3">Planning for and managing residential, commercial and industrial development</td>
          <td>Rating of 8, 9 or 10</td><td>13%</td></tr>
      <tr><td>Average rating</td><td>6.4</td></tr>
      <tr><td>Don't know responses</td><td>11%</td></tr>
      <tr><td rowspan="3">Environmental protection, support for green projects (e.g. green grants, building retrofits programs, zero waste)</td>
          <td>Rating of 8, 9 or 10</td><td>35%</td></tr>
      <tr><td>Average rating</td><td>8.0</td></tr>
      <tr><td>Don't know responses</td><td>8%</td></tr>
    </tbody></table>"""
    ok, why = check_table(
        table,
        "Planning for and managing residential, commercial and industrial development",
        down="Environmental protection,\nsupport for green projects\n"
             "(e.g. green grants,\nbuilding retrofits programs,\nzero waste)",
        max_diffs=5)
    assert ok, why


# -- baseline (test_tests.py:1436-1520) -------------------------------------

def test_baseline_verdicts():
    assert check_baseline("This is some normal content")[0]
    ok, why = check_baseline("   \n\t  ")
    assert not ok and "alphanumeric" in why
    ok, why = check_baseline("abc" * 10, max_repeats=2)
    assert not ok and "repeat" in why
    ok, why = check_baseline("This has Chinese characters: 你好")
    assert not ok and "disallowed" in why
    ok, why = check_baseline("This has emoji: \U0001f60a")
    assert not ok and "\U0001f60a" in why
    assert check_baseline("This is some normal content with proper English "
                          "letters and no suspicious repetition.")[0]


def test_baseline_blank_page_image_tags():
    content = ("Hello ![Diagram showing labeled components 100, 101, 102]"
               "(page_370.png) World")
    assert check_baseline(content, max_length=10,
                          max_length_skips_image_alt_tags=True)[0]
    ok, why = check_baseline(content, max_length=10)
    assert not ok and "expected-blank" in why.replace("expected to be blank",
                                                      "expected-blank")


# -- math -------------------------------------------------------------------

def test_math_check():
    assert check_math(r"Text \(E = mc^2\) more", "E = mc^2")[0]
    assert check_math(r"$$\frac{a}{b}$$", r"\frac{a}{b}")[0]
    assert check_math(r"$\frac{ a }{ b }$", r"\frac{a}{b}")[0]  # ws-normalized
    assert not check_math("no math here", "E = mc^2")[0]


def test_indel_ratio_basics():
    assert indel_ratio("abc", "abc") == 1.0
    assert indel_ratio("abc", "xyz") == 0.0
    assert indel_ratio("target text", "targett text") == pytest.approx(22 / 23)


def test_rule_checks_spark_operator(spark):
    """Broadcast-join + mapInPandas path: verdicts match the pure
    functions, and the plan broadcasts the rules side (no shuffle of the
    documents table)."""
    import json

    from deepseek_ocr_omnidocbench_spark.operators.rule_checks import rule_checks

    docs = spark.createDataFrame(
        [("u1", "alpha beta gamma"), ("u2", MD_TABLE), ("u3", "   ")],
        "url string, text string")
    rules = spark.createDataFrame(
        [("u1", "r1", "present", json.dumps({"text": "beta"})),
         ("u1", "r2", "order", json.dumps({"before": "alpha", "after": "gamma"})),
         ("u2", "r3", "table", json.dumps({"cell": "Cell A2", "up": "Header 2"})),
         ("u3", "r4", "baseline", "{}"),
         ("u1", "r5", "absent", json.dumps({"text": "delta"}))],
        "url string, rule_id string, rule_type string, params string")
    out = rule_checks(docs, rules)
    got = {r["rule_id"]: r["passed"] for r in out.collect()}
    assert got == {"r1": True, "r2": True, "r3": True, "r4": False, "r5": True}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_run_check_dispatch():
    assert run_check("present", "has target text", {"text": "target text"})[0]
    assert not run_check("nope", "x", {})[0]
    # malformed params fail the rule, never raise
    ok, why = run_check("order", "x", {"before": "a"})
    assert not ok and "error" in why
