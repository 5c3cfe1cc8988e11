"""DSIR importance resampling (operators/dsir.py)."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.operators.dsir import (
    dsir_log_weights,
    gumbel_topk_sample,
    hashed_feature_counts,
    md5_bucket,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_feature_counts_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "x"), (3, "")],
                               "doc_id long, text string")
    out = (hashed_feature_counts(df, n_buckets=64)
           .groupBy("doc_id").agg(F.sum("cnt").alias("n")).collect())
    got = {r["doc_id"]: r["n"] for r in out}
    assert got[1] == 3          # a, b, "a b"
    assert got[2] == 1          # x
    assert 3 not in got          # empty doc emits no features


def test_weights_favor_target_distribution(spark):
    # target speaks only of cats; raw corpus is cats + stock market
    cats = [(i, "the cat sat on the mat and the cat purred") for i in range(10)]
    stocks = [(100 + i, "stock prices fell as markets closed lower today")
              for i in range(10)]
    docs = spark.createDataFrame(cats + stocks, "doc_id long, text string")
    target = docs.where(F.col("doc_id") < 10)
    w = {r["doc_id"]: r["logw"]
         for r in dsir_log_weights(docs, target, n_buckets=512).collect()}
    cat_avg = sum(w[i] for i in range(10)) / 10
    stock_avg = sum(w[100 + i] for i in range(10)) / 10
    assert cat_avg > stock_avg
    assert cat_avg > 0 > stock_avg


def test_empty_doc_gets_zero_weight(spark):
    docs = spark.createDataFrame([(1, "hello world"), (2, "")],
                                 "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dsir_log_weights(docs, docs, n_buckets=64).collect()}
    assert out[2]["logw"] == 0.0 and out[2]["n_feats"] == 0
    # target == raw: every observed bucket has identical probability on
    # both sides, so the weight is exactly 0
    assert abs(out[1]["logw"]) < 1e-12


def test_gumbel_topk_deterministic_and_weight_sensitive(spark):
    rows = [(i, 10.0 if i < 5 else -10.0) for i in range(100)]
    w = spark.createDataFrame(rows, "doc_id long, logw double")
    s1 = gumbel_topk_sample(w, k=5).collect()
    s2 = gumbel_topk_sample(w, k=5).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    # a 20-unit log-weight gap dominates Gumbel noise: all 5 heavy docs
    assert {r["doc_id"] for r in s1} == {0, 1, 2, 3, 4}
    # different seed reorders within the heavy group but stays heavy
    s3 = gumbel_topk_sample(w, k=5, seed=99).collect()
    assert {r["doc_id"] for r in s3} == {0, 1, 2, 3, 4}


def test_md5_bucket_range(docs):
    out = (hashed_feature_counts(docs, n_buckets=128, bucket_fn=md5_bucket)
           .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
           .collect()[0])
    assert 0 <= out["lo"] and out["hi"] < 128


def test_dsir_weights_match_pure_python_reference(spark):
    """Spark DSIR weights vs an independent pure-Python implementation
    (same md5 bucket hash, same add-one smoothing) on a random corpus."""
    import hashlib
    import math
    import random

    from deepseek_ocr_omnidocbench_spark.operators.dsir import (
        dsir_log_weights,
        md5_bucket,
    )

    rng = random.Random(31)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "theta"]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 12))))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target_ids = {i for i in range(30) if i % 3 == 0}
    target = docs.where(F.col("doc_id") % 3 == 0)
    B = 64

    def bucket(feat):
        return int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % B

    def feats(text):
        ws = [w for w in text.lower().split() if w]
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def model(ids):
        counts = {}
        for i, text in rows:
            if i in ids:
                for f in feats(text):
                    b = bucket(f)
                    counts[b] = counts.get(b, 0) + 1
        total = sum(counts.values())
        return counts, total

    tc, tt = model(target_ids)
    rc, rt = model(set(range(30)))
    want = {}
    for i, text in rows:
        lw = 0.0
        for f in feats(text):
            b = bucket(f)
            lp_t = math.log10((tc.get(b, 0) + 1) / (tt + B))
            lp_r = math.log10((rc[b] + 1) / (rt + B))
            lw += lp_t - lp_r
        want[i] = lw

    got = {r["doc_id"]: r["logw"] for r in
           dsir_log_weights(docs, target, n_buckets=B,
                            bucket_fn=md5_bucket).collect()}
    for i in range(30):
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])
