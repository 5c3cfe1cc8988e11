"""TEDS — Tree-Edit-Distance-based Similarity for tables (SURVEY §2.6 A3).

The reference scores tables with APTED over parsed HTML trees
(OmniDocBench/metrics 2/table_metric.py:63-134, the published PubTabNet
TEDS metric).  No apted/lxml wheels exist in this container, so this is
a from-scratch Zhang-Shasha tree edit distance (the classic published
algorithm) with the TEDS cost model:

* insert/delete: cost 1;
* rename: 1 if (tag, colspan, rowspan) differ, else — for <td> nodes —
  the normalized Levenshtein distance between cell texts (0 in
  structure_only mode);
* TEDS(a, b) = 1 - dist / max(|a|, |b|).

Tables are small (tens-hundreds of nodes); O(n^2 m^2) worst case is fine
inside an applyInPandas worker.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional

import numpy as np

from ..functions.editdist import norm_edit


class _TNode:
    __slots__ = ("tag", "colspan", "rowspan", "text", "children")

    def __init__(self, tag, colspan="1", rowspan="1", text=""):
        self.tag = tag
        self.colspan = colspan
        self.rowspan = rowspan
        self.text = text
        self.children: list[_TNode] = []


class _TableTreeParser(HTMLParser):
    """HTML -> table tree; only structural table tags become nodes, cell
    markup collapses into the td text (matching TEDS's tokenized cells)."""

    STRUCT = {"table", "thead", "tbody", "tfoot", "tr", "td", "th"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root: Optional[_TNode] = None
        self.stack: list[_TNode] = []
        self._cell: Optional[_TNode] = None

    def handle_starttag(self, tag, attrs):
        if tag not in self.STRUCT:
            return
        if tag == "th":
            tag = "td"
        a = dict(attrs)
        node = _TNode(tag, a.get("colspan", "1") or "1", a.get("rowspan", "1") or "1")
        if tag == "td":
            self._cell = node
        if self.stack:
            self.stack[-1].children.append(node)
        elif tag == "table":
            self.root = node
        self.stack.append(node)

    def handle_endtag(self, tag):
        if tag == "th":
            tag = "td"
        if tag not in self.STRUCT:
            return
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break
        if tag == "td":
            self._cell = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.text += data


def parse_table_tree(html: str) -> Optional[_TNode]:
    m = re.search(r"<table.*?</table>", html or "", re.DOTALL | re.IGNORECASE)
    if not m:
        return None
    p = _TableTreeParser()
    p.feed(m.group(0))
    return p.root


def _postorder(root: _TNode):
    """-> (nodes postorder, leftmost-leaf index per node, keyroots)."""
    nodes: list[_TNode] = []
    lml: list[int] = []

    def walk(n: _TNode) -> int:
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
                if not any(lml[j] == lml[i] for j in range(i + 1, len(nodes)))]
    return nodes, lml, keyroots


def _rename_cost(a: _TNode, b: _TNode, structure_only: bool) -> float:
    if (a.tag, a.colspan, a.rowspan) != (b.tag, b.colspan, b.rowspan):
        return 1.0
    if a.tag == "td" and not structure_only:
        ta = re.sub(r"\s+", " ", a.text).strip()
        tb = re.sub(r"\s+", " ", b.text).strip()
        if ta or tb:
            return norm_edit(ta, tb)
    return 0.0


def tree_edit_distance(t1: _TNode, t2: _TNode, structure_only: bool = False) -> float:
    """Zhang-Shasha ordered tree edit distance with the TEDS cost model."""
    n1, l1, k1 = _postorder(t1)
    n2, l2, k2 = _postorder(t2)
    td = np.zeros((len(n1), len(n2)))

    for i in k1:
        for j in k2:
            li, lj = l1[i], l2[j]
            rows = i - li + 2
            cols = j - lj + 2
            fd = np.zeros((rows, cols))
            fd[1:, 0] = np.arange(1, rows)
            fd[0, 1:] = np.arange(1, cols)
            for x in range(1, rows):
                gi = li + x - 1
                for y in range(1, cols):
                    gj = lj + y - 1
                    if l1[gi] == li and l2[gj] == lj:
                        cost = _rename_cost(n1[gi], n2[gj], structure_only)
                        fd[x, y] = min(fd[x - 1, y] + 1, fd[x, y - 1] + 1,
                                       fd[x - 1, y - 1] + cost)
                        td[gi, gj] = fd[x, y]
                    else:
                        px = l1[gi] - li
                        py = l2[gj] - lj
                        fd[x, y] = min(fd[x - 1, y] + 1, fd[x, y - 1] + 1,
                                       fd[px, py] + td[gi, gj])
    return float(td[len(n1) - 1, len(n2) - 1])


def teds_score(pred_html: str, gt_html: str, structure_only: bool = False) -> float:
    """1 - dist/max(nodes); 0 when either side lacks a table
    (cal_metric.py:49-58 sets errors to 0)."""
    t_pred = parse_table_tree(pred_html)
    t_gt = parse_table_tree(gt_html)
    if t_pred is None or t_gt is None:
        return 0.0
    n_pred = len(_postorder(t_pred)[0])
    n_gt = len(_postorder(t_gt)[0])
    dist = tree_edit_distance(t_pred, t_gt, structure_only)
    denom = max(n_pred, n_gt)
    return 1.0 - dist / denom if denom else 0.0
