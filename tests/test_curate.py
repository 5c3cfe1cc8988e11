"""End-to-end corpus curation plan (plans/curate.py)."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.plans.curate import (
    run_curation,
    run_curation_inline,
)

GOOD_A = ("The quick brown fox jumps over the lazy dog and then walks "
          "through the quiet town with a friend at noon. ") * 5
GOOD_B = ("Many ships sailed across the wide ocean while sailors watched "
          "the bright stars and told long stories all night. ") * 5


@pytest.fixture()
def docs(spark):
    rows = [
        # survivor: passes gates, unique url, min doc_id of its dup pair
        (1, "https://ex.org/a", GOOD_A, "en"),
        # near-dup of 1 (identical text): dropped by minhash clustering
        (2, "https://ex.org/b", GOOD_A, "en"),
        # url-dup of 1 (tracking param): dropped by canonical-url dedup
        (3, "https://ex.org/a?utm_source=x", GOOD_A, "en"),
        # quality reject: too short for the gopher gate
        (4, "https://ex.org/c", "too short.", "en"),
        # independent good doc: survives everything
        (5, "https://ex.org/d", GOOD_B, "en"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, markdown string, lang_pred string")


def test_inline_curation_end_to_end(docs):
    out = run_curation_inline(docs, budget=64).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {1, 5}
    for r in out:
        assert r["n_tokens"] > 0 and r["bin"] >= 0 and r["start_offset"] >= 0


def test_checkpointed_curation_resumes(spark, docs, tmp_path):
    root = str(tmp_path / "curate_ck")
    out1 = run_curation(spark, docs, root, n_buckets=4, budget=64)
    got1 = sorted(r["doc_id"] for r in out1.collect())
    assert got1 == [1, 5]

    from deepseek_ocr_omnidocbench_spark.sources.lineage import (
        StageCheckpoint,
    )
    ck = StageCheckpoint(spark, root, n_buckets=4)
    lin1 = ck.lineage().count()
    stages = {r["stage"] for r in ck.lineage().select("stage").collect()}
    assert stages == {"gated", "url_unique", "survivors", "packed"}
    # cross-bucket stages commit exactly one lineage row
    assert ck.lineage().where(F.col("stage") == "survivors").count() == 1

    # second run: everything committed -> zero new lineage rows
    out2 = run_curation(spark, docs, root, n_buckets=4, budget=64)
    assert sorted(r["doc_id"] for r in out2.collect()) == got1
    assert ck.lineage().count() == lin1

    # throughput report covers all four stages with nonzero doc counts
    rep = {r["stage"]: r for r in ck.throughput_report().collect()}
    assert rep["gated"]["docs"] == 4          # doc 4 gated out
    assert rep["url_unique"]["docs"] == 3     # doc 3 url-deduped
    assert rep["survivors"]["docs"] == 2      # doc 2 near-dup-clustered
    assert rep["packed"]["docs"] == 2


def test_partial_failure_resumes_midway(spark, docs, tmp_path, monkeypatch):
    """Kill the run after the first two stages commit; the retry must
    skip them (no new lineage rows for committed stages) and only run
    the remaining stages."""
    import deepseek_ocr_omnidocbench_spark.plans.curate as C
    from deepseek_ocr_omnidocbench_spark.sources.lineage import (
        StageCheckpoint,
    )

    root = str(tmp_path / "curate_partial")

    def boom(df, **kw):
        raise RuntimeError("simulated executor loss")

    monkeypatch.setattr(C, "stage_survivors", boom)
    with pytest.raises(RuntimeError):
        C.run_curation(spark, docs, root, n_buckets=4, budget=64)
    monkeypatch.undo()

    ck = StageCheckpoint(spark, root, n_buckets=4)
    lin_before = ck.lineage().where(
        F.col("stage").isin("gated", "url_unique")).count()
    assert lin_before == 8  # 4 buckets x 2 committed stages

    out = C.run_curation(spark, docs, root, n_buckets=4, budget=64)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 5]
    lin = ck.lineage()
    # committed stages were NOT recomputed
    assert lin.where(F.col("stage").isin("gated", "url_unique")).count() == 8
    assert lin.where(F.col("stage") == "survivors").count() == 1
    assert lin.where(F.col("stage") == "packed").count() == 1
