"""Checkpoint/lineage + kill-and-resume (SURVEY §7 step 6, north rule)."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.sources.lineage import StageCheckpoint
from deepseek_ocr_omnidocbench_spark.sources.pages import (
    PAGES_ARROW_SCHEMA,
    generate_pages,
)


@pytest.fixture()
def pages_df(spark):
    rows = [r for r in generate_pages(40, seed=5)]
    pdf = pa.Table.from_pylist(rows, schema=PAGES_ARROW_SCHEMA).to_pandas()
    return spark.createDataFrame(pdf)


def test_stage_runs_and_commits_lineage(spark, pages_df, tmp_path):
    ck = StageCheckpoint(spark, str(tmp_path), n_buckets=4)
    out = ck.run_stage("ident", pages_df, lambda df: df.select("url", "lang"))
    assert out.count() == 40
    lin = ck.lineage().where(F.col("stage") == "ident")
    rows = lin.collect()
    assert {r["partition_id"] for r in rows} == {0, 1, 2, 3}
    assert sum(r["doc_count"] for r in rows) == 40


def test_resume_skips_committed_buckets(spark, pages_df, tmp_path):
    ck = StageCheckpoint(spark, str(tmp_path), n_buckets=4)
    calls = []

    def transform(df):
        calls.append(1)
        return df.select("url", "lang")

    ck.run_stage("s1", pages_df, transform)
    first = len(calls)
    assert first == 4
    # "killed and restarted": a fresh checkpoint object over the same root
    ck2 = StageCheckpoint(spark, str(tmp_path), n_buckets=4)
    out = ck2.run_stage("s1", pages_df, transform)
    assert len(calls) == first  # nothing recomputed
    assert out.count() == 40


def test_partial_failure_resume(spark, pages_df, tmp_path):
    """Transform dies on bucket 2 -> restart completes only the rest."""
    ck = StageCheckpoint(spark, str(tmp_path), n_buckets=4)
    seen = []

    class Boom(Exception):
        pass

    def failing(df):
        seen.append(1)
        if len(seen) == 3:
            raise Boom()
        return df.select("url", "lang")

    with pytest.raises(Boom):
        ck.run_stage("s2", pages_df, failing)
    done_before = ck.committed_buckets("s2")
    assert len(done_before) == 2

    ck2 = StageCheckpoint(spark, str(tmp_path), n_buckets=4)
    out = ck2.run_stage("s2", pages_df, lambda df: df.select("url", "lang"))
    assert out.count() == 40
    assert len(ck2.committed_buckets("s2")) == 4


def test_failure_metrics_in_lineage(spark, pages_df, tmp_path):
    """NULLs in failure_col surface as n_failed + failing urls + docs/sec
    in the lineage rows (north rule: per-partition lineage + metrics)."""
    ck = StageCheckpoint(spark, str(tmp_path), n_buckets=2)

    def flaky(df):
        return df.select(
            "url",
            F.when(F.col("category") == "boiler", F.lit(None).cast("string"))
            .otherwise(F.col("text")).alias("md"))

    ck.run_stage("ex", pages_df, flaky, failure_col="md")
    lin = ck.lineage().where(F.col("stage") == "ex").collect()
    n_boiler = pages_df.where(F.col("category") == "boiler").count()
    assert sum(r["n_failed"] for r in lin) == n_boiler
    failing = {u for r in lin for u in r["failure_urls"]}
    assert all("/boiler/" in u for u in failing)
    assert all(r["elapsed_sec"] > 0 for r in lin)
    rep = ck.throughput_report().collect()[0]
    assert rep["stage"] == "ex"
    assert rep["n_failed"] == n_boiler
    assert rep["docs_per_sec_serial"] > 0


def test_bucket_assignment_is_deterministic(spark, pages_df, tmp_path):
    ck = StageCheckpoint(spark, str(tmp_path), n_buckets=8)
    a = ck.bucket_of(pages_df).select("url", "_bucket").collect()
    b = ck.bucket_of(pages_df).select("url", "_bucket").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_iceberg_path_gates_cleanly(spark):
    """No Iceberg jar in this container: the capability check must say
    so and the Iceberg checkpoint must refuse with a pointer to the
    parquet protocol rather than failing mid-pipeline."""
    from deepseek_ocr_omnidocbench_spark.sources.iceberg import (
        IcebergStageCheckpoint,
        iceberg_available,
    )

    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="StageCheckpoint"):
        IcebergStageCheckpoint(spark, "cat.db")
