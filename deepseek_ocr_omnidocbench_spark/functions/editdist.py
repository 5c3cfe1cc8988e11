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


def _encode(s: Sequence) -> np.ndarray:
    if isinstance(s, str):
        return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    return np.asarray([hash(x) for x in s], dtype=np.int64)


def levenshtein_one_to_many(a: Sequence, bs: list) -> np.ndarray:
    """Distances from ``a`` to every sequence in ``bs``, one DP sweep
    vectorized across the whole batch (pad to max length, mask tails).

    Same recurrence as :func:`levenshtein`; the batch dimension turns
    m small DPs into len(a) numpy ops over an (m, Lmax) matrix — the
    C-extension-free answer to the reference's python-Levenshtein use
    (OmniDocBench/utils/match.py:20-29)."""
    m = len(bs)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    a_arr = _encode(a)
    la = len(a_arr)
    lens = np.asarray([len(b) for b in bs], dtype=np.int64)
    lmax = int(lens.max()) if m else 0
    if la == 0:
        return lens.copy()
    if lmax == 0:
        return np.full(m, la, dtype=np.int64)
    B = np.zeros((m, lmax), dtype=np.int64)
    for j, b in enumerate(bs):
        e = _encode(b)
        # pad with distinct sentinels so padded cells never match
        B[j, :len(e)] = e
        B[j, len(e):] = -1 - np.arange(lmax - len(e))
    idx = np.arange(lmax + 1, dtype=np.int64)
    prev = np.broadcast_to(idx, (m, lmax + 1)).copy()
    cur = np.empty_like(prev)
    for i in range(1, la + 1):
        ai = a_arr[i - 1]
        cur[:, 0] = i
        np.minimum(prev[:, :-1] + (B != ai), prev[:, 1:] + 1, out=cur[:, 1:])
        cur -= idx
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += idx
        prev, cur = cur, prev
    return prev[np.arange(m), lens]


def levenshtein_many_to_many(a_list: list, b_list: list) -> np.ndarray:
    """Full |a| x |b| distance matrix; the padded/encoded b batch is
    built ONCE (per-call rebuilding dominated the cost-matrix path)."""
    n, m = len(a_list), len(b_list)
    out = np.zeros((n, m), dtype=np.int64)
    if n == 0 or m == 0:
        return out
    lens = np.asarray([len(b) for b in b_list], dtype=np.int64)
    lmax = int(lens.max())
    B = np.zeros((m, max(lmax, 1)), dtype=np.int64)
    for j, b in enumerate(b_list):
        e = _encode(b)
        B[j, :len(e)] = e
        B[j, len(e):] = -1 - np.arange(B.shape[1] - len(e))
    idx = np.arange(B.shape[1] + 1, dtype=np.int64)
    sel = np.arange(m)
    for i, a in enumerate(a_list):
        a_arr = _encode(a)
        la = len(a_arr)
        if la == 0:
            out[i] = lens
            continue
        if lmax == 0:
            out[i] = la
            continue
        prev = np.broadcast_to(idx, (m, B.shape[1] + 1)).copy()
        cur = np.empty_like(prev)
        for t in range(1, la + 1):
            at = a_arr[t - 1]
            cur[:, 0] = t
            np.minimum(prev[:, :-1] + (B != at), prev[:, 1:] + 1, out=cur[:, 1:])
            cur -= idx
            np.minimum.accumulate(cur, axis=1, out=cur)
            cur += idx
            prev, cur = cur, prev
        out[i] = prev[sel, lens]
    return out


def windowed_distances(text: str, pattern: str) -> np.ndarray:
    """Levenshtein(text[i:i+len(pattern)], pattern) for every window i.

    Exact fixed-length-window semantics of the reference's substring
    fuzzy search (match_quick.py:721-758) — NOT the cheaper
    any-substring (Sellers) variant, which would change threshold
    behavior.  Batched across windows in one DP."""
    lp = len(pattern)
    n_win = len(text) - lp + 1
    if n_win <= 0 or lp == 0:
        return np.empty(0, dtype=np.int64)
    t = _encode(text)
    windows = np.lib.stride_tricks.sliding_window_view(t, lp)  # (n_win, lp)
    p = _encode(pattern)
    idx = np.arange(lp + 1, dtype=np.int64)
    prev = np.broadcast_to(idx, (n_win, lp + 1)).copy()
    cur = np.empty_like(prev)
    for i in range(1, lp + 1):
        pi = p[i - 1]
        cur[:, 0] = i
        np.minimum(prev[:, :-1] + (windows != pi), prev[:, 1:] + 1, out=cur[:, 1:])
        cur -= idx
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += idx
        prev, cur = cur, prev
    return prev[:, lp]


def windowed_indel_distances(text: str, pattern: str) -> np.ndarray:
    """Indel distance (no substitutions; sub = delete+insert = cost 2)
    of ``pattern`` vs every fixed-length window of ``text``.

    rapidfuzz's fuzz.partial_ratio scores each candidate window with the
    indel ratio (|a|+|b|-d)/(|a|+|b|); this supplies d for all windows
    in one batched DP (same prefix-min trick as windowed_distances,
    still valid because insertions cost 1)."""
    lp = len(pattern)
    n_win = len(text) - lp + 1
    if n_win <= 0 or lp == 0:
        return np.empty(0, dtype=np.int64)
    t = _encode(text)
    windows = np.lib.stride_tricks.sliding_window_view(t, lp)
    p = _encode(pattern)
    idx = np.arange(lp + 1, dtype=np.int64)
    prev = np.broadcast_to(idx, (n_win, lp + 1)).copy()
    cur = np.empty_like(prev)
    for i in range(1, lp + 1):
        pi = p[i - 1]
        cur[:, 0] = i
        np.minimum(prev[:, :-1] + 2 * (windows != pi), prev[:, 1:] + 1,
                   out=cur[:, 1:])
        cur -= idx
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += idx
        prev, cur = cur, prev
    return prev[:, lp]


def norm_edit(a: Sequence, b: Sequence) -> float:
    """Levenshtein / max(len) — the reference's normalized distance.

    Both empty -> 0.0 (reference guards this case explicitly).
    """
    m = max(len(a), len(b))
    if m == 0:
        return 0.0
    return levenshtein(a, b) / m


def edit_matrix(gt_lines: list, pred_lines: list) -> np.ndarray:
    """len(gt) x len(pred) normalized distance matrix (match.py:20-29
    parity); each row is one batched one-to-many sweep."""
    n, m = len(gt_lines), len(pred_lines)
    mat = np.zeros((n, m), dtype=np.float64)
    if n == 0 or m == 0:
        return mat
    pred_lens = np.asarray([len(p) for p in pred_lines], dtype=np.int64)
    for i, g in enumerate(gt_lines):
        dists = levenshtein_one_to_many(g, pred_lines)
        denom = np.maximum(np.maximum(pred_lens, len(g)), 1)
        row = dists / denom
        row[(pred_lens == 0) & (len(g) == 0)] = 0.0
        mat[i] = row
    return mat
