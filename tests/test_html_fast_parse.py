"""Fast tokenizer ⇔ stdlib html.parser equivalence (extraction hot path).

The byte-identity invariant rides on parse_html, so the fast path must
produce the same markdown as the stdlib path on (a) every synthetic page
category, (b) handcrafted nasty HTML, (c) random tag-soup fuzz.  Where
the two differ the fast path is wrong by definition — stdlib is the
frozen semantics."""

import random

import pytest

from deepseek_ocr_omnidocbench_spark.operators.html_extract import (
    extract_markdown,
    parse_html,
)
from deepseek_ocr_omnidocbench_spark.sources.pages import generate_pages


def _md_via(html: str, fast: bool) -> str:
    # serialize through the real pipeline so divergence in any event
    # stream shows up in the output markdown
    import deepseek_ocr_omnidocbench_spark.operators.html_extract as H

    orig = H.parse_html
    try:
        H.parse_html = lambda h, fast_=fast: orig(h, fast=fast_)
        return extract_markdown(html)
    finally:
        H.parse_html = orig


def _tree_sig(node):
    if isinstance(node, str):
        return node
    return (node.tag, tuple(sorted(node.attrs.items())),
            tuple(_tree_sig(c) for c in node.children))


def test_corpus_equivalence():
    """Every synthetic page (all categories incl. giants and CJK) must
    parse to an identical tree."""
    rows = generate_pages(400)
    n_html = 0
    for r in rows:
        blob = bytes(r["html"]) if r["html"] is not None else None
        if not blob or blob[:4] == b"%PDF":
            continue
        html = blob.decode("utf-8", "replace")
        n_html += 1
        assert _tree_sig(parse_html(html, fast=True)) == \
            _tree_sig(parse_html(html, fast=False)), r["url"]
    assert n_html > 300


NASTY = [
    "",
    "plain text only",
    "<p>unclosed",
    "<p>a<p>b<p>c",
    "<div><p>x</div></p>",
    "<a href='q>r'>quoted gt</a>",
    '<a title="a>b" href=/x>link</a>',
    "<br/><hr /><img src=x/>",
    "<script>if (a<b && c>d) {}</script><p>after</p>",
    "<script src='x'></script>",
    "<style>p > a { color: red }</style><p>styled</p>",
    "<SCRIPT>var x=1;</SCRIPT><P>UPPER</P>",
    "<!-- comment --><p>a</p><!-- multi\nline -->",
    "<!-- unterminated <p>hidden",
    "<!DOCTYPE html><html><body><p>x</p></body></html>",
    "<?php echo 1; ?><p>pi</p>",
    "<![CDATA[ raw <p>not a tag</p> ]]><p>after cdata</p>",
    "<p>ent &amp; &lt;tag&gt; &#65; &#x42; &nbsp;</p>",
    "<p title='&amp;'>attr entity</p>",
    "<p>a < b and c > d</p>",
    "<p>emoji \U0001f600 and cjk 中文</p>",
    "</p>lonely end</div>",
    "</ bogus><p>x</p>",
    "</><p>y</p>",
    "<3 hearts <p>z</p>",
    "<p data-empty data-val=bare data-q='s'>attrs</p>",
    "<p class>empty attr</p>",
    "<p/>self closing p<p>real</p>",
    "<div style='position:absolute;top:30;left:5'>pos</div>"
    "<div style='position:absolute;top:10;left:2'>first</div>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<ul><li>one<li>two</ul>",
    "<p>trailing lt <",
    "<p>trailing open <div",
    "<p>trailing bang <!",
    "<p>&notanentity; &amp broken</p>",
    "<p>a</p>" * 2000,
]


@pytest.mark.parametrize("idx", range(len(NASTY)))
def test_nasty_equivalence(idx):
    html = NASTY[idx]
    assert _tree_sig(parse_html(html, fast=True)) == \
        _tree_sig(parse_html(html, fast=False)), repr(html[:80])


def test_fuzz_tag_soup_equivalence():
    """Random tag soup assembled from realistic fragments: the two
    parsers must agree on every sample (except inputs where the stdlib
    path itself RAISES from _markupbase — there the fast path must
    simply survive)."""
    rng = random.Random(1234)
    frags = [
        "<p>", "</p>", "<div class='c1 menu'>", "</div>", "text ",
        "words & more ", "<a href='/x'>", "</a>", "<br>", "<b>", "</b>",
        "<script>", "</script>", "var a<b;", "<!-- c -->", "<img src=x>",
        "<td>", "</td>", "<tr>", "<table>", "</table>", "&amp;", "&#65;",
        "<span style=\"top:3\">", "</span>", "<", ">", "</", "<!", "\n",
        "中文 ", "<h2>", "</h2>", "'", '"', "=", "<em >", "</ em>",
        "<![CDATA[", "]]>", "<![if x]>", "<!doctype html>", "/", "<f/",
        "<?pi?>", "<style>", "</style>", "a='b'", " ", "<a b='c>d'>",
    ]
    n_skipped = 0
    for trial in range(1000):
        html = "".join(rng.choice(frags)
                       for _ in range(rng.randrange(1, 60)))
        sig_fast = _tree_sig(parse_html(html, fast=True))  # never raises
        try:
            sig_std = _tree_sig(parse_html(html, fast=False))
        except Exception:
            n_skipped += 1  # stdlib _markupbase raised; fast survived
            continue
        assert sig_fast == sig_std, repr(html)
    assert n_skipped < 200  # the raise path must stay the rare case


def test_stdlib_raises_fast_survives():
    """`<![bogus]>` makes _markupbase raise; the fast path treats it as
    a bogus comment and keeps extracting (robustness win over stdlib)."""
    html = "<p>before</p><![bogus]><p>after</p>"
    root = parse_html(html, fast=True)
    sig = _tree_sig(root)
    assert ("p", (), ("before",)) in sig[2] and ("p", (), ("after",)) in sig[2]
    with pytest.raises(Exception):
        parse_html(html, fast=False)
    # extract_markdown must therefore never route such input to stdlib
    assert "before" in _md_via(html, True)


def test_markdown_identical_on_corpus_sample():
    rows = generate_pages(150)
    for r in rows:
        blob = bytes(r["html"]) if r["html"] is not None else None
        if not blob or blob[:4] == b"%PDF":
            continue
        html = blob.decode("utf-8", "replace")
        assert _md_via(html, True) == _md_via(html, False)
