"""KMV / Count-Min sketches (operators/sketches.py) vs exact counts
and an independent Python replay of the same md5 hash."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.operators.sketches import (
    cms_build,
    cms_probe,
    kmv_distinct,
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestKMV:
    def test_below_capacity_is_exact(self, spark):
        rows = [("a", f"v{i}") for i in range(10)] * 3
        df = spark.createDataFrame(rows, "key string, value string")
        got = kmv_distinct(df, "key", "value", k=64).collect()[0]
        assert got["n_kept"] == 10
        assert got["est_distinct"] == 10.0
        assert got["exact_distinct"] == 10

    def test_estimate_matches_python_replay(self, spark):
        vals = [f"w{i}" for i in range(500)]
        df = spark.createDataFrame([("a", v) for v in vals],
                                   "key string, value string")
        k = 32
        got = kmv_distinct(df, "key", "value", k=k).collect()[0]
        kth = sorted(_md5_60(v) for v in vals)[k - 1]
        want = round((k - 1) * float(2 ** 60) / float(kth), 6)
        assert got["est_distinct"] == want
        assert got["exact_distinct"] == 500
        # the estimate should be in the right ballpark too
        assert 250 < got["est_distinct"] < 1000

    def test_null_values_ignored(self, spark):
        df = spark.createDataFrame(
            [("a", "x"), ("a", None), ("a", "y")],
            "key string, value string")
        got = kmv_distinct(df, "key", "value", k=8).collect()[0]
        assert got["exact_distinct"] == 2

    def test_merge_property(self, spark):
        # KMV of a union == KMV over the concatenated inputs (the
        # mergeability that makes it a partial-agg-safe sketch).
        a = [("k", f"a{i}") for i in range(100)]
        b = [("k", f"b{i}") for i in range(100)]
        df_ab = spark.createDataFrame(a + b, "key string, value string")
        df_ba = spark.createDataFrame(b + a, "key string, value string")
        ea = kmv_distinct(df_ab, "key", "value", k=16).collect()[0]
        eb = kmv_distinct(df_ba, "key", "value", k=16).collect()[0]
        assert ea["est_distinct"] == eb["est_distinct"]


class TestCMS:
    def test_never_underestimates(self, spark):
        rows = [(f"t{i % 37}",) for i in range(1000)]
        terms = spark.createDataFrame(rows, "term string")
        cms = cms_build(terms, depth=4, width=64)
        exact = terms.groupBy("term").agg(
            F.count(F.lit(1)).alias("exact_c"))
        probed = cms_probe(cms, exact, depth=4, width=64).collect()
        assert len(probed) == 37
        for r in probed:
            assert r["cms_est"] >= r["exact_c"]

    def test_wide_sketch_is_exact(self, spark):
        # width >> vocab: collisions are (almost surely) absent and
        # the min-over-rows recovers exact counts.
        rows = [("alpha",)] * 5 + [("beta",)] * 3 + [("gamma",)] * 7
        terms = spark.createDataFrame(rows, "term string")
        cms = cms_build(terms, depth=4, width=65536)
        exact = terms.groupBy("term").agg(
            F.count(F.lit(1)).alias("exact_c"))
        got = {r["term"]: (r["cms_est"], r["exact_c"])
               for r in cms_probe(cms, exact, depth=4,
                                  width=65536).collect()}
        assert got == {"alpha": (5, 5), "beta": (3, 3), "gamma": (7, 7)}

    def test_weighted_equals_raw(self, spark):
        # sketch(pre-aggregated weighted stream) == sketch(raw stream)
        raw = spark.createDataFrame(
            [("x",)] * 4 + [("y",)] * 2, "term string")
        agg = raw.groupBy("term").agg(F.count(F.lit(1)).alias("w"))
        c_raw = {(r["row"], r["bucket"]): r["c"]
                 for r in cms_build(raw, depth=3, width=32).collect()}
        c_agg = {(r["row"], r["bucket"]): r["c"]
                 for r in cms_build(agg, weight_col="w",
                                    depth=3, width=32).collect()}
        assert c_raw == c_agg

    def test_sketch_size_is_bounded(self, spark):
        rows = [(f"t{i}",) for i in range(2000)]
        terms = spark.createDataFrame(rows, "term string")
        cms = cms_build(terms, depth=4, width=64)
        assert cms.count() <= 4 * 64


def test_metric_corr(spark):
    import pytest

    from deepseek_ocr_omnidocbench_spark.operators.sketches import (
        metric_corr)

    rows = ([("lin", i, 3 * i + 7) for i in range(10)]      # r = 1
            + [("anti", i, 100 - 2 * i) for i in range(10)]  # r = -1
            + [("flat", i, 5) for i in range(10)])           # var 0
    d = spark.createDataFrame(rows, ["source", "x", "y"])
    out = {r.source: r for r in metric_corr(d, "x", "y").collect()}
    assert out["lin"].pearson_r == pytest.approx(1.0)
    assert out["anti"].pearson_r == pytest.approx(-1.0)
    assert out["flat"].pearson_r is None
