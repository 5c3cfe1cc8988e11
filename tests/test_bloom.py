"""Bloom-filter seen-set: zero false negatives by construction,
false-positive rate near theory, bitmap compactness, incremental
union semantics."""

import math

import pyspark.sql.functions as F
import pytest

from deepseek_ocr_omnidocbench_spark.operators.dedup import (
    bloom_build, bloom_positions, bloom_probe,
)

M, K = 1 << 14, 5


@pytest.fixture(scope="module")
def seen(spark):
    return spark.createDataFrame(
        [("https://seen.example/p%d" % i,) for i in range(400)],
        "url string")


@pytest.fixture(scope="module")
def bloom(seen):
    return bloom_build(seen, m=M, k=K).cache()


def test_no_false_negatives(seen, bloom):
    out = bloom_probe(seen, bloom, m=M, k=K)
    assert out.where(F.col("maybe_seen") == 0).count() == 0
    assert out.count() == 400


def test_false_positive_rate(spark, bloom):
    fresh = spark.createDataFrame(
        [("https://new.example/q%d" % i,) for i in range(2000)],
        "url string")
    fp = bloom_probe(fresh, bloom, m=M, k=K) \
        .where(F.col("maybe_seen") == 1).count()
    theory = (1 - math.exp(-K * 400 / M)) ** K  # ~2e-5 at these params
    assert fp / 2000 <= max(10 * theory, 0.01)


def test_bitmap_compact(bloom):
    n_chunks = bloom.count()
    assert n_chunks <= M // 32  # at most m/32 rows, only non-zero chunks
    rows = bloom.collect()
    assert all(0 <= r["chunk_id"] < M // 32 for r in rows)
    assert all(r["bits"] != 0 for r in rows)


def test_positions_deterministic_and_in_range(spark):
    df = spark.createDataFrame([("k1",), ("k2",)], "url string")
    a = df.select(bloom_positions(F.col("url"), M, K).alias("p")).collect()
    b = df.select(bloom_positions(F.col("url"), M, K).alias("p")).collect()
    assert [r["p"] for r in a] == [r["p"] for r in b]
    for r in a:
        assert len(r["p"]) == K
        assert all(0 <= x < M for x in r["p"])


def test_incremental_union(spark, seen):
    extra = spark.createDataFrame([("https://late.example/x",)],
                                  "url string")
    # rebuild over union == union the exploded positions: same bitmap
    full = bloom_build(seen.unionByName(extra), m=M, k=K)
    probe = bloom_probe(extra, full, m=M, k=K).collect()
    assert probe[0]["maybe_seen"] == 1
