"""Levenshtein kernel: golden cases + hypothesis vs a naive DP."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_omnidocbench_spark.functions.editdist import (
    edit_matrix,
    levenshtein,
    norm_edit,
)


def naive_lev(a, b):
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        dp[i][0] = i
    for j in range(lb + 1):
        dp[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                           dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return dp[la][lb]


def test_golden():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("flaw", "lawn") == 2
    assert levenshtein("数据处理", "数据处里") == 1


def test_sequences_of_ints():
    assert levenshtein([1, 2, 3], [1, 3]) == 1
    assert levenshtein([1.0, 2.5], [1.0, 2.5]) == 0
    assert levenshtein([], [1]) == 1


@given(st.text(alphabet="abc日", max_size=30), st.text(alphabet="abc日", max_size=30))
@settings(max_examples=200, deadline=None)
def test_matches_naive(a, b):
    assert levenshtein(a, b) == naive_lev(a, b)


def test_norm_edit():
    assert norm_edit("", "") == 0.0
    assert norm_edit("ab", "") == 1.0
    assert norm_edit("kitten", "sitting") == 3 / 7


def test_edit_matrix_shape_and_values():
    m = edit_matrix(["ab", "cd"], ["ab", "ce", "x"])
    assert m.shape == (2, 3)
    assert m[0][0] == 0.0
    assert m[1][1] == 0.5
    assert np.all(m <= 1.0)
