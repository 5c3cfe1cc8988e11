"""Levenshtein edit distance — numpy DP, no C extension needed.

The reference uses the `Levenshtein` C library (e.g.
OmniDocBench/utils/match.py:20-29, metrics 2/cal_metric.py:153).  This
container has no such wheel, so we implement the classic
Wagner-Fischer DP with a vectorized inner row.  Runs inside pandas-UDF
workers only — never on the driver hot path.

The insertion recurrence cur[j] = min(cur[j], cur[j-1]+1) is a prefix-min:
    cur[j] = j + min_{k<=j} (cur[k] - k)
so it vectorizes with np.minimum.accumulate.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Exact Levenshtein distance between two sequences (str or lists)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la < lb:  # iterate over the shorter outer dim
        a, b, la, lb = b, a, lb, la
    if isinstance(b, str):
        b_arr = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    else:
        # hash elements so mixed types compare by equality
        b_arr = np.asarray([hash(x) for x in b], dtype=np.int64)
        a = [hash(x) for x in a]
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        ai = ord(a[i - 1]) if isinstance(a, str) else a[i - 1]
        cur[0] = i
        np.minimum(prev[:-1] + (b_arr != ai), prev[1:] + 1, out=cur[1:])
        # prefix-min for insertions
        cur -= idx
        np.minimum.accumulate(cur, out=cur)
        cur += idx
        prev, cur = cur, prev
    return int(prev[lb])


def norm_edit(a: Sequence, b: Sequence) -> float:
    """Levenshtein / max(len) — the reference's normalized distance.

    Both empty -> 0.0 (reference guards this case explicitly).
    """
    m = max(len(a), len(b))
    if m == 0:
        return 0.0
    return levenshtein(a, b) / m


def edit_matrix(gt_lines: list, pred_lines: list) -> np.ndarray:
    """len(gt) x len(pred) normalized distance matrix (match.py:20-29 parity)."""
    mat = np.zeros((len(gt_lines), len(pred_lines)), dtype=np.float64)
    for i, g in enumerate(gt_lines):
        for j, p in enumerate(pred_lines):
            mat[i, j] = norm_edit(g, p)
    return mat
