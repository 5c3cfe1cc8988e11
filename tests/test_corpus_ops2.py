"""Paragraph-level dedup (CCNet-style), PII scrubbing, TF-IDF top terms."""

import math

import pyspark.sql.functions as F

from deepseek_ocr_omnidocbench_spark.operators.dedup import paragraph_dedup
from deepseek_ocr_omnidocbench_spark.operators.filters import pii_scrub
from deepseek_ocr_omnidocbench_spark.operators.textstats import tfidf_top_terms

BOILER = "All rights reserved. Contact us for more information."


class TestParagraphDedup:
    def _corpus(self, spark):
        rows = [
            (0, "unique alpha paragraph\n\n" + BOILER),
            (1, BOILER + "\n\nunique beta paragraph"),
            (2, "only original content here"),
            # same boilerplate but different digits/case -> still dedups
            (3, "all RIGHTS reserved. Contact us 2024 for more information."),
            (4, None),
            (5, BOILER + "\n\n" + BOILER),  # self-duplicate
        ]
        return spark.createDataFrame(rows, "doc_id int, text string")

    def test_first_occurrence_survives(self, spark):
        out = {r["doc_id"]: r for r in
               paragraph_dedup(self._corpus(spark)).collect()}
        assert out[0]["clean_text"] == "unique alpha paragraph\n\n" + BOILER
        assert out[0]["n_removed_paras"] == 0
        # doc 1's copy of the boilerplate is removed
        assert out[1]["clean_text"] == "unique beta paragraph"
        assert out[1]["n_removed_paras"] == 1
        assert out[2]["n_removed_paras"] == 0

    def test_normalization_folds_digits_and_case(self, spark):
        out = {r["doc_id"]: r for r in
               paragraph_dedup(self._corpus(spark)).collect()}
        # doc 3 normalizes to the same paragraph as the boilerplate
        assert out[3]["clean_text"] == ""
        assert out[3]["n_removed_paras"] == 1

    def test_self_duplicate_and_null(self, spark):
        out = {r["doc_id"]: r for r in
               paragraph_dedup(self._corpus(spark)).collect()}
        assert out[5]["n_paras"] == 2
        assert out[5]["n_removed_paras"] == 2  # doc 0 owns the survivor
        assert 4 not in out  # null text -> no paragraphs -> absent

    def test_md5_matches_xxhash(self, spark):
        c = self._corpus(spark)
        a = sorted(map(tuple, paragraph_dedup(c).collect()))
        b = sorted(map(tuple, paragraph_dedup(c, key_fn=F.md5).collect()))
        assert a == b


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        df = spark.createDataFrame(
            [(0, "mail a.b+c@ex-ample.co.uk and 192.168.0.1 or 555-123-4567"),
             (1, "no pii at all"),
             (2, "two mails x@y.io z@w.org")],
            "doc_id int, text string")
        out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) \
            == (1, 1, 1)
        assert out[0]["scrubbed_text"] == \
            "mail <EMAIL> and <IPV4> or <PHONE>"
        assert out[1]["scrubbed_text"] == "no pii at all"
        assert out[2]["n_email"] == 2
        assert "<EMAIL>" in out[2]["scrubbed_text"]
        assert "x@y.io" not in out[2]["scrubbed_text"]

    def test_boundaries(self, spark):
        # phone-like token inside a longer digit run is NOT a phone;
        # ipv4 needs word boundaries on both sides
        df = spark.createDataFrame(
            [(0, "9555-123-45678 and v1.2.3.4x")],
            "doc_id int, text string")
        r = pii_scrub(df).collect()[0]
        assert r["n_phone"] == 0 and r["n_ipv4"] == 0


class TestTfidf:
    def test_scores_and_topk(self, spark):
        df = spark.createDataFrame(
            [(0, "apple apple banana"),
             (1, "apple cherry"),
             (2, "durian")],
            "doc_id int, text string")
        out = tfidf_top_terms(df, k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 0: apple tf=2 df=2, banana tf=1 df=1
        idf = lambda d: math.log(4 / (d + 1)) + 1  # noqa: E731
        d0 = {r["term"]: r for r in by_doc[0]}
        assert d0["apple"]["tf"] == 2 and d0["apple"]["df"] == 2
        assert abs(d0["apple"]["score"] - 2 * idf(2)) < 1e-6
        assert abs(d0["banana"]["score"] - idf(1)) < 1e-6
        # banana (rare) outscores apple's per-occurrence idf but
        # apple's tf=2 wins overall here
        assert d0["apple"]["score"] > d0["banana"]["score"]
        # k bound respected
        assert all(len(v) <= 2 for v in by_doc.values())

    def test_deterministic_ties(self, spark):
        df = spark.createDataFrame([(0, "zed yak ant")],
                                   "doc_id int, text string")
        out = [r["term"] for r in
               tfidf_top_terms(df, k=2).orderBy("term").collect()]
        # all three tie on score; term-asc tiebreak keeps ant + yak
        assert out == ["ant", "yak"]


class TestC4Clean:
    def test_rules(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.textstats import c4_clean
        doc = ("This line has plenty of words and ends properly.\n"
               "no terminal punctuation here at all\n"
               "short line.\n"
               "Enable javascript to view this site properly please.\n"
               "Another perfectly fine sentence with enough words here.\n"
               "   \n")
        df = spark.createDataFrame(
            [(0, doc), (1, "one good line but only one, sadly kept alone.\nx.\ny"),
             (2, None)],
            "doc_id int, text string")
        out = {r["doc_id"]: r for r in c4_clean(df).collect()}
        assert out[0]["n_lines"] == 5  # blank line dropped pre-count
        assert out[0]["n_kept_lines"] == 2
        assert out[0]["keep_doc"] == 0  # 2 < 3
        assert out[0]["clean_text"] == (
            "This line has plenty of words and ends properly.\n"
            "Another perfectly fine sentence with enough words here.")
        assert out[1]["n_kept_lines"] == 1 and out[1]["keep_doc"] == 0
        assert out[2]["n_lines"] == 0 and out[2]["clean_text"] == ""

    def test_keep_threshold(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.textstats import c4_clean
        good = "\n".join(
            f"Sentence number {i} carries exactly enough words today." for i in range(4))
        df = spark.createDataFrame([(0, good)], "doc_id int, text string")
        r = c4_clean(df).collect()[0]
        assert r["n_kept_lines"] == 4 and r["keep_doc"] == 1


class TestDomainStats:
    def test_aggregates(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.textstats import domain_stats
        rows = [
            ("https://A.com/x", "the and of to in is that for with as on words"),
            ("https://a.com:8080/y", "casino viagra casino viagra casino"),
            ("http://b.org/z", "plain text content"),
        ]
        df = spark.createDataFrame(rows, "url string, text string")
        out = {r["domain"]: r for r in domain_stats(df).collect()}
        # host lowercased; port split off by the [^/?:] class
        assert set(out) == {"a.com", "b.org"}
        assert out["a.com"]["n_docs"] == 2
        assert out["a.com"]["spam_share"] == 0.5
        assert out["b.org"]["spam_share"] == 0.0
        assert 0.0 < out["a.com"]["avg_quality"] < 1.0
