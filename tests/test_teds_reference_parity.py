"""TEDS parity against the reference's OWN scorer (A3 cross-check).

Imports `metrics 2/table_metric.py` from the read-only reference mount
with its C/tree deps shimmed:

- Levenshtein  -> functions/editdist.levenshtein (token-list capable);
- apted.APTED  -> a generic scalar Zhang-Shasha TED written HERE that
  calls the REFERENCE's CustomConfig.rename for rename costs (so the
  reference's tokenization, tree shape, and cost model all run as
  published, with only the exact-TED kernel shared — both APTED and
  Zhang-Shasha compute the exact ordered tree edit distance);
- lxml.html    -> a minimal stdlib-html.parser DOM with just enough
  xpath (body/table, .//*) for TEDS.evaluate.

Inputs are the 10 real demo GT tables pushed through our
normalized_table (the same preprocessing the eval harness applies
before TEDS), paired as identity / cross / cell-mutation pairs, scored
by our operators/teds.teds_score and the reference TEDS class, asserted
equal within 1e-6.
"""

import os
import re
import sys
import types
from html.parser import HTMLParser

import pytest

REF_METRICS = "/root/reference/OmniDocBench/metrics 2"
DEMO_JSON = ("/root/reference/OmniDocBench/demo_data/omnidocbench_demo/"
             "OmniDocBench_demo.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEMO_JSON), reason="reference demo data not present")


# ---------------------------------------------------------------------------
# lxml shim: minimal DOM


class _El:
    def __init__(self, tag, attrib=None):
        self.tag = tag
        self.attrib = attrib or {}
        self.text = None
        self.tail = None
        self._children = []

    def getchildren(self):
        return list(self._children)

    def _iter_desc(self):
        for c in self._children:
            yield c
            yield from c._iter_desc()

    def xpath(self, expr):
        if expr == ".//*":
            return list(self._iter_desc())
        # 'body/table' relative to the root element (html)
        out = []
        cur = [self]
        for step in expr.split("/"):
            nxt = []
            for el in cur:
                nxt.extend(c for c in el._children if c.tag == step)
            cur = nxt
        return cur


_VOID = {"br", "hr", "img", "meta", "link", "input", "col"}


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = None
        self.stack = []
        self._last = None  # element whose tail is open

    def handle_starttag(self, tag, attrs):
        el = _El(tag, dict(attrs))
        if self.stack:
            self.stack[-1]._children.append(el)
        elif self.root is None:
            self.root = el
        self._last = None
        if tag not in _VOID:
            self.stack.append(el)
        else:
            self._last = el

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                self._last = self.stack[i]
                del self.stack[i:]
                return

    def handle_data(self, data):
        if self._last is not None:
            self._last.tail = (self._last.tail or "") + data
        elif self.stack:
            el = self.stack[-1]
            if el._children:
                last = el._children[-1]
                last.tail = (last.tail or "") + data
            else:
                el.text = (el.text or "") + data


def _fromstring(s, parser=None):
    b = _DomBuilder()
    b.feed(s)
    root = b.root
    if root is not None and root.tag != "html":
        wrap = _El("html")
        body = _El("body")
        wrap._children = [body]
        body._children = [root]
        root = wrap
    return root


# ---------------------------------------------------------------------------
# apted shim: generic scalar Zhang-Shasha, costs delegated to the
# reference's Config object


def _zs_distance(t1, t2, config):
    import numpy as np

    def postorder(root):
        nodes, lml = [], []

        def walk(n):
            first = None
            for ch in n.children:
                f = walk(ch)
                if first is None:
                    first = f
            idx = len(nodes)
            nodes.append(n)
            lml.append(first if first is not None else idx)
            return lml[idx]

        walk(root)
        keyroots = [i for i in range(len(nodes))
                    if not any(lml[j] == lml[i]
                               for j in range(i + 1, len(nodes)))]
        return nodes, lml, keyroots

    n1, l1, k1 = postorder(t1)
    n2, l2, k2 = postorder(t2)
    td = np.zeros((len(n1), len(n2)))
    for i in k1:
        for j in k2:
            li, lj = l1[i], l2[j]
            rows, cols = i - li + 2, j - lj + 2
            fd = np.zeros((rows, cols))
            fd[1:, 0] = np.arange(1, rows)
            fd[0, 1:] = np.arange(1, cols)
            for x in range(1, rows):
                gi = li + x - 1
                for y in range(1, cols):
                    gj = lj + y - 1
                    if l1[gi] == li and l2[gj] == lj:
                        cost = config.rename(n1[gi], n2[gj])
                        fd[x, y] = min(fd[x - 1, y] + 1, fd[x, y - 1] + 1,
                                       fd[x - 1, y - 1] + cost)
                        td[gi, gj] = fd[x, y]
                    else:
                        px, py = l1[gi] - li, l2[gj] - lj
                        fd[x, y] = min(fd[x - 1, y] + 1, fd[x, y - 1] + 1,
                                       fd[px, py] + td[gi, gj])
    return float(td[-1, -1])


@pytest.fixture(scope="module")
def ref_teds():
    from deepseek_ocr_omnidocbench_spark.functions.editdist import levenshtein

    lev = types.ModuleType("Levenshtein")
    lev.distance = levenshtein

    apted_mod = types.ModuleType("apted")

    class _APTED:
        def __init__(self, t1, t2, config):
            self._args = (t1, t2, config)

        def compute_edit_distance(self):
            return _zs_distance(*self._args)

    class _Config:
        def rename(self, a, b):  # overridden by CustomConfig
            raise NotImplementedError

    apted_mod.APTED = _APTED
    apted_mod.Config = _Config
    helpers = types.ModuleType("apted.helpers")

    class _Tree:
        pass

    helpers.Tree = _Tree
    apted_mod.helpers = helpers

    lxml_mod = types.ModuleType("lxml")
    lxml_html = types.ModuleType("lxml.html")
    lxml_html.fromstring = _fromstring
    lxml_html.HTMLParser = lambda **k: None
    lxml_etree = types.ModuleType("lxml.etree")
    lxml_etree.strip_tags = lambda *a, **k: None
    lxml_mod.html = lxml_html
    lxml_mod.etree = lxml_etree

    tq = types.ModuleType("tqdm")
    tq.tqdm = lambda it=None, **k: it

    saved = {}
    mods = {"Levenshtein": lev, "apted": apted_mod,
            "apted.helpers": helpers, "lxml": lxml_mod,
            "lxml.html": lxml_html, "lxml.etree": lxml_etree, "tqdm": tq}
    for name, mod in mods.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    sys.path.insert(0, REF_METRICS)
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_table_metric", os.path.join(REF_METRICS, "table_metric.py"))
        tm = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tm)
        yield tm
    finally:
        sys.path.remove(REF_METRICS)
        for name, old in saved.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old


def _demo_tables():
    import json

    d = json.load(open(DEMO_JSON))
    out = []
    for page in d:
        for det in page.get("layout_dets", []):
            if det.get("category_type") == "table" and det.get("html"):
                out.append(det["html"])
    return out


def _pairs(tables):
    from deepseek_ocr_omnidocbench_spark.functions.normalize import (
        normalized_table)

    norm = [normalized_table(t, "html") for t in tables]
    pairs = []
    for i, t in enumerate(norm):
        pairs.append((t, t))                      # identity → 1.0
        pairs.append((t, norm[(i + 1) % len(norm)]))   # cross tables
        mut = re.sub(r"\d", "7", t, count=5)      # small cell edits
        pairs.append((t, mut))
    return pairs


@pytest.mark.parametrize("structure_only", [False, True])
def test_teds_matches_reference_on_demo_tables(ref_teds, structure_only):
    from deepseek_ocr_omnidocbench_spark.operators.teds import teds_score

    ref = ref_teds.TEDS(structure_only=structure_only)
    tables = _demo_tables()
    assert len(tables) == 10
    diverged = []
    for k, (a, b) in enumerate(_pairs(tables)):
        want = ref.evaluate(a, b)
        got = teds_score(a, b, structure_only=structure_only)
        if abs(got - want) > 1e-6:
            diverged.append((k, got, want))
    assert not diverged, diverged[:5]


def test_identity_pairs_score_one(ref_teds):
    from deepseek_ocr_omnidocbench_spark.functions.normalize import (
        normalized_table)

    ref = ref_teds.TEDS()
    for t in _demo_tables():
        n = normalized_table(t, "html")
        assert ref.evaluate(n, n) == pytest.approx(1.0)
