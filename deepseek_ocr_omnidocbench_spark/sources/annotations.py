"""Synthetic OmniDocBench-style evaluation fixtures (FIXTURES.md §2-§3).

Per page: a flattened gt_elements list (the explode of
OmniDocBench.json's layout_dets, SURVEY §1.1), a page_attribute map, and
a predicted markdown string derived from GT with seeded perturbations —
each perturbation targets a specific matcher sub-op:

* char typos              -> nonzero but small edit distances
* merged paragraphs       -> truncation merge (J4c)
* split paragraphs        -> many-gt-to-one-pred rescue (J4f)
* dropped/kept captions   -> ignore-category pre-match (J4b)
* table as pipe-md vs html-> format arbitration (J7)
* grounding tokens        -> F12 cleanup
* swapped block order     -> reading-order metric (A6)
* \\begin{array} formulas -> equation array split (J4a)

``perturb=0`` produces a perfect prediction: every edit must be 0.0,
TEDS 1.0 — the fixed-point regression used in tests.
"""

from __future__ import annotations

import random

from ..functions.normalize import md_escape

_WORDS = (
    "analysis baseline batch cluster column data document element engine "
    "executor experiment extraction filter formula heading index join "
    "markdown match measure method metric model network order page "
    "paragraph partition pipeline query research result science score "
    "shuffle sink source spark stage stream system table task value"
).split()

_FORMULAS = [
    r"E = mc^2", r"\sum_{i=1}^{n} x_i", r"\alpha + \beta = \gamma",
    r"f(x) = x^2 + 1", r"a_{n+1} = a_n + d", r"\int_0^1 g(t) dt",
]

_IGNORE_KINDS = ["figure_caption", "table_caption", "header", "footer", "page_number"]
_SOURCES = ["book", "academic_literature", "note", "magazine"]
_LAYOUTS = ["single_column", "double_column"]


def _sentence(rng, lo=5, hi=12):
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(rng, lo=2, hi=4):
    return " ".join(_sentence(rng) for _ in range(rng.randint(lo, hi)))


def _typo(rng, s: str, rate: float) -> str:
    chars = list(s)
    for i in range(len(chars)):
        if chars[i].isalnum() and rng.random() < rate:
            chars[i] = rng.choice("abcdefghijklmnopqrstuvwxyz")
    return "".join(chars)


def _gt_table_html(rng) -> str:
    ncol = rng.randint(2, 4)
    nrow = rng.randint(2, 4)
    head = "<tr>" + "".join("<td>%s</td>" % rng.choice(_WORDS) for _ in range(ncol)) + "</tr>"
    body = "".join(
        "<tr>" + "".join("<td>%d</td>" % rng.randint(0, 99) for _ in range(ncol)) + "</tr>"
        for _ in range(nrow))
    return "<table>" + head + body + "</table>"


def _table_as_pipe_md(html: str) -> str:
    import re
    rows = re.findall(r"<tr>(.*?)</tr>", html)
    grid = [re.findall(r"<td>(.*?)</td>", r) for r in rows]
    out = ["| " + " | ".join(grid[0]) + " |", "|" + " --- |" * len(grid[0])]
    out += ["| " + " | ".join(r) + " |" for r in grid[1:]]
    return "\n".join(out)


def generate_page(img_id: str, rng: random.Random, perturb: float = 1.0):
    """-> (gt_rows, page_attr_row, pred_md)."""
    elements: list[dict] = []
    anno_id = 0
    order = 0

    def add(cat, text=None, latex=None, html=None, attribute=None, truncated_pair=None):
        nonlocal anno_id, order
        anno_id += 1
        order += 1
        elements.append({
            "img_id": img_id, "anno_id": anno_id, "category_type": cat,
            "order": float(order), "text": text, "latex": latex, "html": html,
            "ignore": cat in _IGNORE_KINDS,
            "attribute": attribute or {"text_language": "en", "text_background": "white"},
            "truncated_pair": truncated_pair,
        })
        return elements[-1]

    lang = "zh" if rng.random() < 0.2 else "en"
    if rng.random() < 0.3:
        add("header", text=_sentence(rng, 2, 4))
    add("title", text=_sentence(rng, 3, 6).rstrip("."))
    n_blocks = rng.randint(3, 6)
    split_block = rng.randrange(n_blocks) if rng.random() < 0.5 else -1
    for b in range(n_blocks):
        if b == split_block:
            para = _paragraph(rng, 3, 5)
            cut = para.find(" ", len(para) // 2)
            first = add("text_block", text=para[:cut])
            second = add("text_block", text=para[cut:])
            first["truncated_pair"] = second["anno_id"]
        else:
            add("text_block", text=_paragraph(rng))
        if rng.random() < 0.35:
            add("equation_isolated", latex=rng.choice(_FORMULAS))
    if rng.random() < 0.25:  # multi-line single-column array formula (J4a)
        rows = " \\\\ ".join(rng.choice(_FORMULAS) for _ in range(2))
        add("equation_isolated", latex="\\begin{array}{l} %s \\end{array}" % rows)
    has_table = rng.random() < 0.6
    if has_table:
        add("table_caption", text=_sentence(rng, 3, 6))
        add("table", html=_gt_table_html(rng))
    if rng.random() < 0.4:
        add("figure_caption", text=_sentence(rng, 3, 6))
    if rng.random() < 0.5:
        add("page_number", text=str(rng.randint(1, 400)))
    if rng.random() < 0.3:
        add("footer", text=_sentence(rng, 2, 4))

    page_attr = {
        "img_id": img_id,
        "page_attribute": {
            "data_source": rng.choice(_SOURCES),
            "language": lang,
            "layout": rng.choice(_LAYOUTS),
        },
        "special_issue": ["watermark"] if rng.random() < 0.15 else [],
    }

    # ---- prediction markdown ----
    p = perturb
    blocks: list[tuple[float, str]] = []  # (order, md)
    drop_next_merge = False
    by_order = sorted(elements, key=lambda e: e["order"])
    for i, el in enumerate(by_order):
        cat = el["category_type"]
        md: str | None
        if cat == "title":
            md = "# " + el["text"]
        elif cat in ("text_block", "header", "footer", "table_caption",
                     "figure_caption", "page_number"):
            if cat in _IGNORE_KINDS and rng.random() < 0.3 * p:
                continue  # dropped caption/chrome
            md = _typo(rng, el["text"], 0.02 * p)
        elif cat == "equation_isolated":
            latex = el["latex"]
            delim = rng.random()
            if delim < 0.5:
                md = "\\[ %s \\]" % latex
            else:
                md = "$$ %s $$" % latex
        elif cat == "table":
            if rng.random() < 0.5 * p:
                md = _table_as_pipe_md(el["html"])
            else:
                md = el["html"]
        else:
            md = el.get("text") or ""
        if md:
            blocks.append((el["order"], md))

    # swap two adjacent text blocks (reading-order perturbation)
    if p > 0 and len(blocks) > 3 and rng.random() < 0.3:
        k = rng.randrange(len(blocks) - 1)
        blocks[k], blocks[k + 1] = blocks[k + 1], blocks[k]

    parts = [b[1] for b in blocks]
    # merge two adjacent paragraphs into one pred block (J4c fodder)
    if p > 0 and len(parts) > 4 and rng.random() < 0.4:
        k = rng.randrange(len(parts) - 1)
        if not parts[k].startswith(("<table", "|", "\\[", "$$", "#")) and \
           not parts[k + 1].startswith(("<table", "|", "\\[", "$$", "#")):
            parts[k:k + 2] = [parts[k] + " " + parts[k + 1]]

    md_out = "\n\n".join(parts)
    if p > 0 and rng.random() < 0.2:
        md_out = ("<|ref|>title<|/ref|><|det|>[[80,40,500,80]]<|/det|>\n" + md_out)
    return elements, page_attr, md_out


def generate_eval_fixtures(n_pages: int, seed: int = 42, perturb: float = 1.0):
    """-> (gt_rows, page_attr_rows, pred_rows) for n synthetic pages."""
    gt_rows, page_rows, pred_rows = [], [], []
    for i in range(n_pages):
        rng = random.Random("eval:%d:%d" % (seed, i))
        img_id = "synth_page_%05d.jpg" % i
        els, pattr, md = generate_page(img_id, rng, perturb)
        gt_rows.extend(els)
        page_rows.append(pattr)
        pred_rows.append({"img_id": img_id, "md": md})
    return gt_rows, page_rows, pred_rows
