"""Corpus curation: contamination check + stratified mixing."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.operators.curation import (
    ngram_contamination,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "en", "alpha beta gamma delta epsilon completely different tail "
                  "words here now"),
        (2, "en", "nothing shared with anything else at all in this one"),
        (3, "de", "kurz"),                      # shorter than n -> fallback
        (4, "de", ""),                          # empty
        (5, "fr", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_contamination_exact_and_partial(spark, corpus):
    bench = corpus.where(F.col("doc_id") == 0).select("text")
    out = {r["doc_id"]: r.asDict()
           for r in ngram_contamination(corpus, bench, n=5).collect()}
    # doc 0 is the benchmark itself -> fully contaminated
    assert out[0]["contamination"] == pytest.approx(1.0)
    assert out[0]["is_contaminated"] == 1
    # doc 5 repeats doc 0 verbatim -> fully contaminated
    assert out[5]["contamination"] == pytest.approx(1.0)
    # doc 1 shares exactly one 5-gram (alpha..epsilon) of its 7
    assert out[1]["n_ngrams"] == 7
    assert out[1]["n_hit"] == 1
    assert out[1]["contamination"] == pytest.approx(1 / 7)
    assert out[1]["is_contaminated"] == 0
    # doc 2 shares nothing
    assert out[2]["n_hit"] == 0 and out[2]["contamination"] == 0.0
    # short doc: one fallback shingle, not in benchmark
    assert out[3]["n_ngrams"] == 1 and out[3]["n_hit"] == 0
    # every corpus row is present exactly once
    assert set(out) == {0, 1, 2, 3, 4, 5}


def test_contamination_short_doc_verbatim_match(spark):
    docs = spark.createDataFrame(
        [(0, "tiny eval prompt"), (1, "tiny eval prompt"), (2, "other text")],
        "doc_id long, text string")
    bench = docs.where(F.col("doc_id") == 0).select("text")
    out = {r["doc_id"]: r["is_contaminated"]
           for r in ngram_contamination(docs, bench, n=13).collect()}
    assert out == {0: 1, 1: 1, 2: 0}


def test_stratified_quotas_exact(spark, corpus):
    out = stratified_sample(corpus, quotas={"en": 2, "de": 1}, seed=3)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 2, "de": 1}  # fr has no quota -> dropped


def test_stratified_deterministic_and_layout_independent(spark, corpus):
    a = {r["doc_id"] for r in
         stratified_sample(corpus, quotas={"en": 2}, seed=3).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(corpus.repartition(7), quotas={"en": 2},
                           seed=3).collect()}
    assert a == b and len(a) == 2
    c = {r["doc_id"] for r in
         stratified_sample(corpus, quotas={"en": 2}, seed=4).collect()}
    assert len(c) == 2  # a different seed is a valid (possibly equal) draw


def test_stratified_fraction_mode(spark):
    rows = [(i, "en" if i % 2 else "de", f"text {i}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = stratified_sample(docs, fraction=0.3, seed=1)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 15, "de": 15}
    with pytest.raises(ValueError):
        stratified_sample(docs)
    with pytest.raises(ValueError):
        stratified_sample(docs, quotas={"en": 1}, fraction=0.5)


def test_quota_larger_than_stratum(spark, corpus):
    out = stratified_sample(corpus, quotas={"de": 99}, seed=3)
    assert out.count() == 2  # whole stratum survives


def test_curation_pipeline_reasons(spark):
    from deepseek_ocr_omnidocbench_spark.operators.curation import (
        curation_pipeline,
    )

    good = ("The quick brown fox jumps over the lazy dog and then walks "
            "through the quiet town with a friend. ") * 5
    short = "too short."
    runaway = good + "z" * 100  # period-1 trailing repetition
    spammy = ("download pdf free ebook download file " * 30)
    rows = [(1, good), (2, short), (3, runaway), (4, spammy)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in curation_pipeline(df).collect()}
    assert out[1]["keep"] == 1 and out[1]["reasons"] == ""
    assert out[2]["keep"] == 0 and "gopher" in out[2]["reasons"]
    assert out[3]["g_runaway"] == 0 and "runaway" in out[3]["reasons"]
    assert out[4]["g_spam"] == 0 and "spam" in out[4]["reasons"]
    # reasons list is fixed-order comma-joined gate names
    for r in out.values():
        assert r["keep"] == (1 if r["reasons"] == "" else 0)


def test_curation_pipeline_null_and_garbage_text(spark):
    from deepseek_ocr_omnidocbench_spark.operators.curation import (
        curation_pipeline,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "\x00\x01 garbage"), (4, " \n\t ")],
        "doc_id long, text string")
    out = curation_pipeline(df).collect()
    assert len(out) == 4
    for r in out:
        assert r["keep"] == 0
        # every gate verdict is non-NULL even for NULL text
        for g in ("g_gopher", "g_spam", "g_runaway", "g_lang"):
            assert r[g] is not None, (r["doc_id"], g)
        assert r["reasons"] != ""


def test_mixture_weights_alpha(spark):
    from pyspark.sql import functions as F

    from deepseek_ocr_omnidocbench_spark.operators.curation import (
        mixture_weights,
    )

    docs = spark.createDataFrame(
        [("big", "w " * 900), ("small", "w " * 100)],
        "source string, text string")
    # alpha=1 -> proportional to token mass
    w1 = {r.source: r.weight for r in mixture_weights(docs, alpha=1.0).collect()}
    assert abs(w1["big"] - 0.9) < 1e-9 and abs(w1["small"] - 0.1) < 1e-9
    # alpha<1 flattens: the small source gains share
    w3 = {r.source: r.weight for r in mixture_weights(docs, alpha=0.3).collect()}
    assert w3["small"] > 0.1 and w3["big"] < 0.9
    assert abs(sum(w3.values()) - 1.0) < 1e-6
    # budget split sums (approximately; per-source rounding) to the budget
    rows = mixture_weights(docs, alpha=0.3, token_budget=10_000).collect()
    assert abs(sum(r.budget_tokens for r in rows) - 10_000) <= len(rows)


def test_latest_revision(spark):
    from deepseek_ocr_omnidocbench_spark.operators.filters import (
        latest_revision,
    )

    pages = spark.createDataFrame(
        [("u1", 10, "old"), ("u1", 30, "new"), ("u1", 20, "mid"),
         ("u2", 5, "only"),
         ("u3", 7, "aaa"), ("u3", 7, "bbb")],  # exact-ts tie
        "url string, warc_ts long, body string")
    out = {r.url: r for r in
           latest_revision(pages, tiebreak_col="body").collect()}
    assert out["u1"].body == "new" and out["u1"].n_revisions == 3
    assert out["u2"].body == "only" and out["u2"].n_revisions == 1
    # tie broken by md5(body): deterministic winner across reruns
    first = out["u3"].body
    again = {r.url: r for r in
             latest_revision(pages.repartition(7), tiebreak_col="body")
             .collect()}
    assert again["u3"].body == first
    assert out["u3"].n_revisions == 2


def test_host_split_leakage_safe(spark):
    """Every host lands in exactly one split, assignment is
    deterministic, and fractions roughly follow the bucket shares."""
    from deepseek_ocr_omnidocbench_spark.operators.curation import (
        host_split)
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "https://host%d.example.com/p/%d" % (i % 50, i))
         for i in range(400)], ["doc_id", "url"])
    out = host_split(docs).collect()
    assert len(out) == 400
    by_host = {}
    for r in out:
        assert r["split"] in ("train", "val", "test")
        assert 0 <= r["bucket"] < 100
        prev = by_host.setdefault(r["host"], r["split"])
        assert prev == r["split"], r["host"]  # no host straddles splits
    splits = {s: sum(1 for r in out if r["split"] == s)
              for s in ("train", "val", "test")}
    assert splits["train"] > splits["val"] > 0
    assert splits["test"] > 0
    # deterministic across invocations
    again = host_split(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # zero-shuffle plan
    plan = (host_split(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan, plan


def test_quality_calibration(spark):
    from deepseek_ocr_omnidocbench_spark.operators.curation import (
        quality_calibration)

    # source A: metrics 1..10; source B: metrics 100..104 — a raw
    # threshold would nuke all of A; rank calibration keeps the same
    # share of each
    rows = [("A", i, i) for i in range(1, 11)] + \
           [("B", 100 + i, 100 + i) for i in range(5)]
    d = spark.createDataFrame(rows, ["source", "doc_id", "m"])
    out = quality_calibration(d, "m", keep_frac=0.6).collect()
    kept = {"A": 0, "B": 0}
    for r in out:
        assert 0.0 < r.pct < 1.0
        if r.keep:
            kept[r.source] += 1
    # pct >= 0.4: A keeps ranks 5..10 (pct (2r-1)/20 >= .4 -> r >= 4.5)
    assert kept["A"] == 6
    # B: (2r-1)/10 >= .4 -> r >= 2.5 -> ranks 3,4,5
    assert kept["B"] == 3
