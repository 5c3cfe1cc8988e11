"""Assignment kernel vs exhaustive brute force (scipy contract)."""

import itertools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_omnidocbench_spark.functions.hungarian import linear_sum_assignment


def brute_min(cost):
    n, m = cost.shape
    k = min(n, m)
    best = None
    if n <= m:
        for cols in itertools.permutations(range(m), k):
            s = sum(cost[i, c] for i, c in enumerate(cols))
            if best is None or s < best:
                best = s
    else:
        for rows in itertools.permutations(range(n), k):
            s = sum(cost[r, j] for j, r in enumerate(rows))
            if best is None or s < best:
                best = s
    return best


def test_identity():
    c = np.array([[0.0, 1.0], [1.0, 0.0]])
    r, cidx = linear_sum_assignment(c)
    assert list(r) == [0, 1] and list(cidx) == [0, 1]


def test_rectangular_wide_and_tall():
    c = np.array([[1.0, 0.0, 2.0]])
    r, cidx = linear_sum_assignment(c)
    assert list(r) == [0] and list(cidx) == [1]
    r, cidx = linear_sum_assignment(c.T)
    assert list(r) == [1] and list(cidx) == [0]


def test_empty():
    r, c = linear_sum_assignment(np.zeros((0, 3)))
    assert len(r) == 0 and len(c) == 0


@given(st.integers(1, 5), st.integers(1, 5), st.integers(0, 10 ** 6))
@settings(max_examples=150, deadline=None)
def test_optimal_cost_matches_bruteforce(n, m, seed):
    rng = np.random.RandomState(seed)
    cost = rng.rand(n, m)
    r, c = linear_sum_assignment(cost)
    assert len(r) == min(n, m)
    assert len(set(r.tolist())) == len(r)
    assert len(set(c.tolist())) == len(c)
    got = cost[r, c].sum()
    want = brute_min(cost)
    assert abs(got - want) < 1e-9
