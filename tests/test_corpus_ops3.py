"""Round-5 batch 4: ROUGE-N, encoding health, dehyphenation, host
boilerplate prefix, sampled quantiles."""

from __future__ import annotations

import pyspark.sql.functions as F

from deepseek_ocr_omnidocbench_spark.functions.normalize import (
    dehyphenate,
    dehyphenate_col,
)
from deepseek_ocr_omnidocbench_spark.functions.rouge import rouge_n_scores
from deepseek_ocr_omnidocbench_spark.operators.encoding import (
    MOJIBAKE_MARKERS,
    encoding_health_cols,
    encoding_report,
    fix_mojibake,
)
from deepseek_ocr_omnidocbench_spark.operators.filters import host_prefix_stats
from deepseek_ocr_omnidocbench_spark.operators.sketches import sampled_quantiles


class TestRougeN:
    def _scores(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id int, pred string, ref string")
        return {r["doc_id"]: r for r in
                rouge_n_scores(df, "pred", "ref").collect()}

    def test_identical_strings_score_one(self, spark):
        out = self._scores(spark, [(0, "the cat sat on the mat",
                                    "the cat sat on the mat")])
        for c in ("rouge1_p", "rouge1_r", "rouge1_f",
                  "rouge2_p", "rouge2_r", "rouge2_f"):
            assert out[0][c] == 1.0, c

    def test_disjoint_strings_score_zero(self, spark):
        out = self._scores(spark, [(0, "alpha beta gamma", "delta epsilon")])
        for c in ("rouge1_f", "rouge2_f"):
            assert out[0][c] == 0.0

    def test_hand_computed_example(self, spark):
        # ref: "police killed the gunman" / pred: "police kill the gunman"
        # (the Lin 2004 running example, word unigrams):
        # overlap {police, the, gunman} = 3; |pred|=4, |ref|=4
        out = self._scores(spark, [(0, "police kill the gunman",
                                    "police killed the gunman")])
        assert out[0]["rouge1_p"] == 0.75
        assert out[0]["rouge1_r"] == 0.75
        assert out[0]["rouge1_f"] == 0.75
        # bigrams: pred {police kill, kill the, the gunman},
        # ref {police killed, killed the, the gunman} -> 1 match of 3
        assert round(out[0]["rouge2_p"], 6) == round(1 / 3, 6)
        assert round(out[0]["rouge2_f"], 6) == round(1 / 3, 6)

    def test_clipping_counts_multiset(self, spark):
        # pred repeats "the" 3x but ref has it twice -> clipped to 2
        out = self._scores(spark, [(0, "the the the", "the the cat")])
        assert round(out[0]["rouge1_p"], 6) == round(2 / 3, 6)
        assert round(out[0]["rouge1_r"], 6) == round(2 / 3, 6)

    def test_empty_pred_scores_zero_row_still_present(self, spark):
        out = self._scores(spark, [(0, "", "some reference text"),
                                   (1, "some reference text", "")])
        assert set(out) == {0, 1}
        assert out[0]["rouge1_f"] == 0.0
        assert out[1]["rouge2_f"] == 0.0


class TestEncodingHealth:
    def test_counts_planted_damage(self, spark):
        rows = [(0, "clean ascii text", "a"),
                (1, "caf" + MOJIBAKE_MARKERS[3] + " menu", "a"),   # Ã©
                (2, "bad �� bytes", "a"),
                (3, "ctl\x02chars\x1f", "a"),
                (4, "quote " + MOJIBAKE_MARKERS[0], "b")]          # â€™
        df = spark.createDataFrame(rows, "doc_id int, text string, source string")
        h = encoding_health_cols(F.col("text"))
        out = {r["doc_id"]: r for r in df.select(
            "doc_id", *[v.alias(k) for k, v in h.items()]).collect()}
        assert not out[0]["is_damaged"]
        assert out[1]["n_mojibake"] == 1 and out[1]["is_damaged"]
        assert out[2]["n_replacement"] == 2
        assert out[3]["n_control"] == 2
        assert out[4]["n_mojibake"] == 1

    def test_fix_mojibake_repairs_and_report_aggregates(self, spark):
        rows = [(0, "caf" + MOJIBAKE_MARKERS[3] + " menu", "a"),
                (1, "bad � data", "a"),
                (2, "fine", "a")]
        df = spark.createDataFrame(rows, "doc_id int, text string, source string")
        fixed = df.select(fix_mojibake(F.col("text")).alias("t")).collect()
        assert fixed[0]["t"] == "café menu"
        rep = encoding_report(df).collect()[0]
        assert rep["n_docs"] == 3
        assert rep["n_damaged"] == 2
        # mojibake-only damage is repairable; U+FFFD damage is not
        assert rep["n_repairable"] == 1
        assert abs(rep["damaged_share"] - 2 / 3) < 1e-6


class TestDehyphenate:
    CASES = [
        "exam-\nple joined",
        "exam- \n  ple spaced",
        "range 3-\n4 not joined",
        "soft­hyphen gone",
        "multi co-\nlumn hy-\nphens",
        "trailing hyphen-\n",
        "",
    ]

    def test_python_kernel(self):
        assert dehyphenate(self.CASES[0]) == "example joined"
        assert dehyphenate(self.CASES[1]) == "example spaced"
        assert dehyphenate(self.CASES[2]) == "range 3-\n4 not joined"
        assert dehyphenate(self.CASES[3]) == "softhyphen gone"
        assert dehyphenate(self.CASES[4]) == "multi column hyphens"
        assert dehyphenate(self.CASES[5]) == "trailing hyphen-\n"

    def test_column_matches_python(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(self.CASES)], "i int, s string")
        got = {r["i"]: r["out"] for r in df.select(
            "i", dehyphenate_col(F.col("s")).alias("out")).collect()}
        for i, s in enumerate(self.CASES):
            assert got[i] == dehyphenate(s), repr(s)


class TestHostPrefixStats:
    def test_detects_planted_banner(self, spark):
        banner = "acme widgets incorporated news "
        rows = [(banner + "story one", "a"),
                (banner + "another story", "a"),
                (banner + "third body", "a"),
                ("unrelated doc", "b"),
                ("zebra text", "b"),
                ("single doc host", "c")]
        df = spark.createDataFrame(rows, "text string, source string")
        out = {r["host"]: r for r in host_prefix_stats(df).collect()}
        # min="...another story", max="...third body" -> prefix is the banner
        assert out["a"]["prefix_len"] == len(banner)
        assert out["a"]["shared_prefix"].startswith(banner)
        assert out["a"]["is_boilerplate"]
        assert out["b"]["prefix_len"] == 0
        assert not out["b"]["is_boilerplate"]
        # single-doc host: prefix is trivially the whole doc, but n_docs
        # < 2 keeps the flag off
        assert not out["c"]["is_boilerplate"]

    def test_prefix_capped(self, spark):
        common = "x" * 500
        df = spark.createDataFrame(
            [(common + "a", "h"), (common + "b", "h")], "text string, source string")
        out = host_prefix_stats(df, max_prefix=200).collect()[0]
        assert out["prefix_len"] == 200
        assert out["shared_prefix"] == "x" * 200


class TestSampledQuantiles:
    def _df(self, spark, n=200):
        return spark.createDataFrame(
            [(i, "k%d" % (i % 2), (i * 37) % 1000) for i in range(n)],
            "doc_id long, source string, n_chars long")

    def test_rate_one_matches_exact(self, spark):
        out = sampled_quantiles(self._df(spark), "source", "n_chars",
                                "doc_id", rate=1).collect()
        for r in out:
            assert r["n_sampled"] == r["n_rows"]
            for q in ("p50", "p90", "p99"):
                assert r[f"est_{q}"] == r[f"exact_{q}"], q

    def test_exact_is_rank_statistic(self, spark):
        df = self._df(spark, n=40)
        out = {r["key"]: r for r in sampled_quantiles(
            df, "source", "n_chars", "doc_id", rate=4).collect()}
        for key in ("k0", "k1"):
            vals = sorted(r["n_chars"] for r in df.collect()
                          if r["source"] == key)
            n = len(vals)
            import math
            assert out[key]["exact_p50"] == vals[math.ceil(0.5 * n) - 1]
            assert out[key]["exact_p90"] == vals[math.ceil(0.9 * n) - 1]

    def test_sample_is_deterministic(self, spark):
        a = sampled_quantiles(self._df(spark), "source", "n_chars",
                              "doc_id", rate=4).collect()
        b = sampled_quantiles(self._df(spark), "source", "n_chars",
                              "doc_id", rate=4).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))
        for r in a:
            assert r["n_sampled"] is None or r["n_sampled"] <= r["n_rows"]
