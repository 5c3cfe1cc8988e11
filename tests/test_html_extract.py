"""HTML -> markdown extractor: boilerplate pruning, serialization,
reading order, and the byte-identity round-trip invariant."""

from deepseek_ocr_omnidocbench_spark.operators.html_extract import (
    extract_markdown,
    parse_html,
    prune,
)
from deepseek_ocr_omnidocbench_spark.sources.pages import generate_pages


def test_headings_and_paragraphs():
    md = extract_markdown("<h1>Title</h1><p>Body text.</p><h2>Sub</h2>")
    assert md == "# Title\n\nBody text.\n\n## Sub"


def test_lists():
    md = extract_markdown("<ul><li>a</li><li>b</li></ul><ol><li>x</li></ol>")
    assert md == "- a\n- b\n\n1. x"


def test_inline_markup():
    md = extract_markdown("<p>a <strong>b</strong> <em>c</em> <code>d</code></p>")
    assert md == "a **b** *c* `d`"


def test_regular_table_to_pipes():
    md = extract_markdown(
        "<table><tr><th>h1</th><th>h2</th></tr><tr><td>1</td><td>2</td></tr></table>")
    assert md == "| h1 | h2 |\n| --- | --- |\n| 1 | 2 |"


def test_irregular_table_stays_html():
    md = extract_markdown(
        '<table><tr><td rowspan="2">a</td><td>b</td></tr><tr><td>c</td></tr></table>')
    assert md.startswith("<table>")
    assert 'rowspan="2"' in md


def test_code_block():
    md = extract_markdown('<pre><code class="language-py">x = 1</code></pre>')
    assert md == "```py\nx = 1\n```"


def test_blockquote():
    md = extract_markdown("<blockquote><p>quoted</p></blockquote>")
    assert md == "> quoted"


def test_script_style_nav_dropped():
    md = extract_markdown(
        "<script>var x;</script><style>p{}</style><nav><a href='/'>home</a></nav>"
        "<p>real</p><aside>side</aside>")
    assert md == "real"


def test_class_hint_noise_dropped():
    md = extract_markdown('<div class="sidebar"><p>junk</p></div><p>keep</p>')
    assert md == "keep"


def test_link_farm_dropped_but_long_link_block_kept():
    farm = "<div>" + "".join('<a href="/%d">word word</a> ' % i for i in range(10)) + "</div>"
    md = extract_markdown(farm + "<p>content</p>")
    assert md == "content"
    # a link-dense block with substantial text survives (min-text guard)
    long_links = "<div><a href='/x'>%s</a></div>" % ("t" * 300)
    assert "t" * 300 in (extract_markdown(long_links) or "")


def test_header_footer_outside_article_dropped_inside_kept():
    md = extract_markdown("<header><p>chrome</p></header><p>body</p>")
    assert md == "body"
    md2 = extract_markdown("<article><header><p>title area</p></header><p>body</p></article>")
    assert "title area" in md2


def test_absolute_position_reading_order():
    html = (
        '<div style="position:absolute; top:100px; left:10px"><p>second</p></div>'
        '<div style="position:absolute; top:20px; left:10px"><p>first</p></div>'
    )
    assert extract_markdown(html) == "first\n\nsecond"


def test_same_line_sorts_left_to_right():
    html = (
        '<div style="position:absolute; top:50px; left:300px"><p>right</p></div>'
        '<div style="position:absolute; top:52px; left:10px"><p>left</p></div>'
    )
    assert extract_markdown(html) == "left\n\nright"


def test_definition_list():
    md = extract_markdown("<dl><dt>Term</dt><dd>meaning one</dd>"
                          "<dt>Other</dt><dd>meaning two</dd></dl>")
    assert md == "**Term**\n: meaning one\n**Other**\n: meaning two"


def test_figcaption():
    md = extract_markdown("<figure><img src='x.png'>"
                          "<figcaption>A chart of results</figcaption></figure>")
    assert md == "*A chart of results*"


def test_malformed_html_no_crash():
    assert extract_markdown("<p>unclosed <div><b>x") is not None
    assert extract_markdown("") == ""
    assert extract_markdown(None) is None


def test_entity_unescape():
    assert extract_markdown("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_prune_preserves_article_content():
    root = parse_html("<article><p>x</p></article><nav>n</nav>")
    prune(root)
    # nav gone, article kept
    tags = [c.tag for c in root.children if not isinstance(c, str)]
    assert "nav" not in tags


def test_byte_identity_roundtrip_200_pages():
    """The north-rule invariant: extractor(html) == text, byte for byte."""
    from deepseek_ocr_omnidocbench_spark.operators.pdf_extract import extract_pdf_markdown

    for row in generate_pages(200, seed=7):
        if row["category"] == "pdfish":
            got = extract_pdf_markdown(row["html"]) or ""
        else:
            got = extract_markdown(row["html"].decode("utf-8")) or ""
        assert got == row["text"], row["url"]


def test_spark_extract_pages_byte_identity(spark):
    """Distributed path: binary column in, markdown out, equal to text."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from deepseek_ocr_omnidocbench_spark.operators.html_extract import extract_pages
    from deepseek_ocr_omnidocbench_spark.sources.pages import PAGES_ARROW_SCHEMA

    # pdfish included: extract_pages sniffs %PDF and routes accordingly
    rows = list(generate_pages(60, seed=3))
    pdf = pa.Table.from_pylist(rows, schema=PAGES_ARROW_SCHEMA).to_pandas()
    df = spark.createDataFrame(pdf)
    out = extract_pages(df, salt_buckets=4)
    joined = out.join(df.select("url", "text"), "url")
    n_bad = joined.where(
        F.coalesce(F.col("md"), F.lit("")) != F.coalesce(F.col("text"), F.lit(""))
    ).count()
    assert n_bad == 0
    assert out.count() == len(rows)


def test_page_metadata_cols(spark):
    from pyspark.sql import functions as F

    from deepseek_ocr_omnidocbench_spark.operators.html_extract import (
        page_metadata_cols,
    )

    rows = [
        (1, '<html lang="en"><head><title>Hello</title>'
            '<meta name="description" content="a page">'
            '<link rel="canonical" href="https://x.example/a">'
            '<meta property="og:title" content="OG Hello">'
            '</head><body></body></html>'),
        (2, "<html><head></head><body>no metadata</body></html>"),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    m = page_metadata_cols(F.col("html"))
    out = {r["id"]: r for r in df.select(
        "id", *[m[k].alias(k) for k in m]).collect()}
    assert out[1]["title"] == "Hello"
    assert out[1]["meta_description"] == "a page"
    assert out[1]["canonical_href"] == "https://x.example/a"
    assert out[1]["og_title"] == "OG Hello"
    assert out[1]["html_lang"] == "en"
    assert all(out[2][k] is None for k in
               ("title", "meta_description", "canonical_href",
                "og_title", "html_lang"))
