"""Minimum-cost bipartite assignment (Hungarian / Jonker-Volgenant).

Drop-in replacement for scipy.optimize.linear_sum_assignment, which the
reference uses for element matching (OmniDocBench/utils/match.py:205,
match_quick.py:938-948) but which isn't available in this container.

O(n^3) shortest-augmenting-path formulation with dual potentials — the
textbook algorithm (see Burkard/Dell'Amico/Martello, "Assignment
Problems").  Rectangular matrices supported by running on the transposed
matrix when rows > cols, like scipy does.
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost) -> tuple[np.ndarray, np.ndarray]:
    """Return (row_ind, col_ind) minimizing cost[row_ind, col_ind].sum().

    row_ind is sorted ascending, matching scipy's contract.
    """
    c = np.asarray(cost, dtype=np.float64)
    if c.ndim != 2:
        raise ValueError("cost matrix must be 2-D")
    n, m = c.shape
    if n == 0 or m == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    transposed = n > m
    if transposed:
        c = c.T
        n, m = m, n

    INF = np.inf
    # potentials u (rows, 1-indexed internally), v (cols); way[j] = parent col
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row matched to col j (0 = free)
    way = np.zeros(m + 1, dtype=np.int64)

    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            unused = ~used[1:]
            cur = c[i0 - 1] - u[i0] - v[1:]
            upd = unused & (cur < minv[1:])
            minv[1:][upd] = cur[upd]
            way[1:][upd] = j0
            masked = np.where(unused, minv[1:], INF)
            j1 = int(np.argmin(masked)) + 1
            delta = masked[j1 - 1]
            u[p[used]] += delta
            v[used] -= delta
            minv[~used] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    rows = []
    cols = []
    for j in range(1, m + 1):
        if p[j] > 0:
            rows.append(p[j] - 1)
            cols.append(j - 1)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if transposed:
        rows, cols = cols, rows
    order = np.argsort(rows, kind="stable")
    return rows[order], cols[order]
