"""Product-quantization tests (similarity.py PQ section)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.operators.similarity import (
    pq_adc_topk,
    pq_assign,
    train_pq_codebooks,
)

DIM, M, K = 16, 4, 4


@pytest.fixture(scope="module")
def vecs(spark):
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(DIM)])
            for i in range(60)]
    return rows, spark.createDataFrame(rows, ["vec_id", "embedding"])


def _recon_error(rows, codebooks):
    d = DIM // M
    err = 0.0
    for _, v in rows:
        for s in range(M):
            sv = v[s * d:(s + 1) * d]
            best = min(
                sum((a - b) * (a - b) for a, b in zip(sv, c))
                for c in codebooks[s])
            err += best
    return err


def test_pq_training_monotone(vecs):
    """Each Lloyd round must not increase total reconstruction error
    (up to the 6dp centroid rounding)."""
    rows, df = vecs
    errs = []
    for iters in (0, 1, 2):
        cbs = train_pq_codebooks(df, dim=DIM, m=M, k=K, iters=iters)
        errs.append(_recon_error(rows, cbs))
    assert errs[1] <= errs[0] + 1e-6
    assert errs[2] <= errs[1] + 1e-6
    # and training actually moves: 2 rounds strictly beat init here
    assert errs[2] < errs[0]


def test_pq_assign_shapes_and_ranges(vecs):
    rows, df = vecs
    cbs = train_pq_codebooks(df, dim=DIM, m=M, k=K, iters=1)
    out = pq_assign(df, cbs, dim=DIM).collect()
    assert len(out) == len(rows)
    for r in out:
        assert len(r["codes"]) == M
        assert all(0 <= c < K for c in r["codes"])
    # assignment is the true argmin vs a python recompute
    d = DIM // M
    by_id = {i: v for i, v in rows}
    for r in out[:10]:
        v = by_id[r["vec_id"]]
        for s in range(M):
            sv = v[s * d:(s + 1) * d]
            dists = [sum((a - b) * (a - b) for a, b in zip(sv, c))
                     for c in cbs[s]]
            assert r["codes"][s] == dists.index(min(dists))


def test_pq_adc_equals_reconstructed_distance(vecs):
    """ADC(q, codes(x)) must equal the exact squared L2 between q and
    the RECONSTRUCTION of x (sum of per-subspace centroid distances) —
    the defining identity of asymmetric distance computation."""
    rows, df = vecs
    cbs = train_pq_codebooks(df, dim=DIM, m=M, k=K, iters=1)
    codes = pq_assign(df, cbs, dim=DIM).select("vec_id", "codes")
    queries = df.where(F.col("vec_id") < 3)
    got = pq_adc_topk(codes, queries, cbs, dim=DIM, k=60,
                      rank_precision=9).collect()
    code_map = {r["vec_id"]: r["codes"]
                for r in codes.collect()}
    by_id = {i: v for i, v in rows}
    d = DIM // M
    for r in got[:30]:
        q = by_id[r["query_id"]]
        want = 0.0
        for s in range(M):
            c = cbs[s][code_map[r["neighbor_id"]][s]]
            qs = q[s * d:(s + 1) * d]
            want += sum((a - b) * (a - b) for a, b in zip(qs, c))
        assert r["adc_dist"] == pytest.approx(want, abs=1e-7)
    # self excluded
    assert all(r["query_id"] != r["neighbor_id"] for r in got)


def test_pq_empty_cell_keeps_previous_centroid(spark):
    """With k greater than the number of distinct points, unpopulated
    cells must retain their init centroid instead of vanishing."""
    rows = [(i, [float(i % 2)] * DIM) for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cbs = train_pq_codebooks(df, dim=DIM, m=M, k=4, iters=2)
    for s in range(M):
        assert len(cbs[s]) == 4
        assert all(len(c) == DIM // M for c in cbs[s])


def test_pq_deterministic(vecs):
    _, df = vecs
    a = train_pq_codebooks(df, dim=DIM, m=M, k=K, iters=2)
    b = train_pq_codebooks(df, dim=DIM, m=M, k=K, iters=2)
    assert a == b


def test_ivfpq_roundtrip_and_residual_identity(vecs):
    """Index rows carry a valid coarse cell and residual codes; the
    residual of a vector plus its coarse centroid reconstructs within
    PQ error of the original (sanity of the residual plumbing)."""
    from deepseek_ocr_omnidocbench_spark.operators.similarity import (
        ivfpq_assign,
        ivfpq_residuals,
        train_ivfpq,
    )

    rows, df = vecs
    coarse, cbs = train_ivfpq(df, dim=DIM, k_coarse=4, m=M, k=K, iters=2)
    assert len(coarse) == 4 and all(len(c) == DIM for c in coarse)
    out = ivfpq_assign(df, coarse, cbs, dim=DIM).collect()
    assert len(out) == len(rows)
    for r in out:
        assert 0 <= r["coarse_cell"] < 4
        assert all(0 <= c < K for c in r["codes"])
    # residual + coarse centroid == original, exactly
    by_id = {i: v for i, v in rows}
    res = ivfpq_residuals(df, coarse, DIM).collect()
    for r in res[:10]:
        v = by_id[r["vec_id"]]
        c = coarse[r["coarse_cell"]]
        back = [a + b for a, b in zip(r["embedding"], c)]
        assert back == pytest.approx(v, abs=1e-12)


def test_ivfpq_search_probes_only_listed_cells(vecs):
    """With n_probe=1 every returned neighbor must live in the query's
    single nearest coarse cell."""
    from deepseek_ocr_omnidocbench_spark.operators.similarity import (
        ivfpq_adc_topk,
        ivfpq_assign,
        train_ivfpq,
    )

    rows, df = vecs
    coarse, cbs = train_ivfpq(df, dim=DIM, k_coarse=4, m=M, k=K, iters=1)
    index = ivfpq_assign(df, coarse, cbs, dim=DIM) \
        .select("vec_id", "coarse_cell", "codes")
    cell_of = {r["vec_id"]: r["coarse_cell"] for r in index.collect()}
    queries = df.where(F.col("vec_id") < 3)
    got = ivfpq_adc_topk(index, queries, coarse, cbs, dim=DIM,
                         k=10, n_probe=1).collect()
    d = DIM
    by_id = {i: v for i, v in rows}
    for r in got:
        q = by_id[r["query_id"]]
        dists = [sum((a - b) * (a - b) for a, b in zip(q, c))
                 for c in coarse]
        best_cell = dists.index(min(dists))
        assert cell_of[r["neighbor_id"]] == best_cell
    # widening probes can only add candidates (recall monotone in
    # n_probe): top-1 ADC distance never increases
    got2 = ivfpq_adc_topk(index, queries, coarse, cbs, dim=DIM,
                          k=10, n_probe=4).collect()
    best1 = {r["query_id"]: r["adc_dist"] for r in got if r["rank"] == 1}
    best2 = {r["query_id"]: r["adc_dist"] for r in got2 if r["rank"] == 1}
    for qid in best1:
        assert best2[qid] <= best1[qid] + 1e-9
