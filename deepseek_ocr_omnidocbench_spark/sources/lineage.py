"""Stage checkpointing with per-partition lineage + anti-join resume.

Re-expresses the reference's work-queue protocol — sha1 work groups,
done-flag objects, stale locks (olmocr/olmocr/work_queue.py:30-225) — as
atomic table commits:

* each pipeline stage writes its output bucketed by ``xxhash64(url) %
  n_buckets`` (the salt key) to ``<root>/<stage>/data`` and appends one
  lineage row per bucket: (stage, partition_id, doc_count, bytes,
  failure_urls, committed_at run marker);
* a killed job resumes by anti-joining its input's bucket ids against
  committed lineage rows — only missing buckets recompute (O7);
* commit atomicity comes from write-then-rename of the bucket file plus
  the lineage append; on Iceberg this maps 1:1 to snapshot commits +
  a lineage table MERGE (the deployment path at 10^12 docs).

The driver-side orchestration is a few small Spark actions; all data
movement stays in executors.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = ["stage", "partition_id", "doc_count", "bytes", "failure_urls", "committed_at"]


class StageCheckpoint:
    """Parquet-backed staged pipeline with lineage + resume."""

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16,
                 key_col: str = "url"):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.key_col = key_col
        os.makedirs(root, exist_ok=True)

    # -- lineage ------------------------------------------------------------

    def _lineage_path(self) -> str:
        return os.path.join(self.root, "lineage")

    def committed_buckets(self, stage: str) -> set[int]:
        path = self._lineage_path()
        if not os.path.isdir(path) or not os.listdir(path):
            return set()
        rows = (
            self.spark.read.json(path)
            .where(F.col("stage") == stage)
            .select("partition_id").distinct().collect()
        )
        return {r["partition_id"] for r in rows}

    def _append_lineage(self, rows: list[dict]) -> None:
        path = self._lineage_path()
        os.makedirs(path, exist_ok=True)
        fname = os.path.join(path, "lineage-%d-%d.json" % (int(time.time() * 1e6), os.getpid()))
        tmp = fname + ".tmp"
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, fname)  # atomic publish (Iceberg-commit analog)

    # -- stage run ----------------------------------------------------------

    def bucket_of(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_bucket", F.pmod(F.xxhash64(self.key_col), F.lit(self.n_buckets)).cast("int"))

    def stage_output_path(self, stage: str, bucket: int) -> str:
        return os.path.join(self.root, stage, "bucket=%05d" % bucket)

    def run_stage(self, stage: str, inp: DataFrame, transform,
                  failure_col: str | None = None,
                  max_failure_urls: int = 20,
                  cross_bucket: bool = False) -> DataFrame:
        """Apply ``transform(df) -> df`` per uncommitted bucket; commit each
        bucket's parquet + lineage row; return the stage's full output.

        Restart-safe: committed buckets are skipped via lineage anti-join
        semantics (here: set difference on bucket ids, since buckets are
        the work granularity — the exact analog of done-flag hashes).

        Per-partition metrics (north rule "lineage + metrics"): each row
        carries doc_count, bytes, elapsed wall seconds, docs/sec, and —
        when ``failure_col`` names a column whose NULLs mean a failed
        row — the failure count plus up to ``max_failure_urls`` failing
        urls (the reference's per-doc error tracking,
        olmocr/olmocr/pipeline.py:430-434).

        ``cross_bucket=True`` runs the transform over the FULL input as
        one committed unit (bucket 0) — for stages whose semantics span
        buckets (global dedup: a dup pair can straddle bucket keys).
        Resume granularity is the whole stage: committed -> skipped.
        """
        done = self.committed_buckets(stage)
        if cross_bucket:
            bucketed = inp.withColumn("_bucket", F.lit(0).cast("int"))
            todo = [] if 0 in done else [0]
        else:
            bucketed = self.bucket_of(inp)
            todo = sorted(set(range(self.n_buckets)) - done)
        for b in todo:
            t0 = time.monotonic()
            part = bucketed.where(F.col("_bucket") == b).drop("_bucket")
            out = transform(part)
            path = self.stage_output_path(stage, b)
            tmp = path + "__tmp"
            out.write.mode("overwrite").parquet(tmp)
            written = self.spark.read.parquet(tmp)
            aggs = [F.count(F.lit(1)).alias("n"),
                    (F.sum(F.coalesce(F.col("n_chars"), F.lit(0)))
                     if "n_chars" in out.columns else F.lit(0)).alias("bytes")]
            if failure_col and failure_col in out.columns:
                aggs.append(F.sum(F.col(failure_col).isNull().cast("long"))
                            .alias("n_failed"))
            agg = written.agg(*aggs).collect()[0]
            failure_urls: list[str] = []
            n_failed = int(agg["n_failed"]) if failure_col and "n_failed" in agg.asDict() else 0
            if n_failed and self.key_col in out.columns:
                failure_urls = [
                    r[self.key_col]
                    for r in written.where(F.col(failure_col).isNull())
                    .select(self.key_col).limit(max_failure_urls).collect()
                ]
            if os.path.isdir(path):
                import shutil
                shutil.rmtree(path)
            os.rename(tmp, path)
            elapsed = time.monotonic() - t0
            self._append_lineage([{
                "stage": stage, "partition_id": b,
                "doc_count": int(agg["n"]), "bytes": int(agg["bytes"] or 0),
                "n_failed": n_failed, "failure_urls": failure_urls,
                "elapsed_sec": round(elapsed, 3),
                "docs_per_sec": round(int(agg["n"]) / elapsed, 2) if elapsed > 0 else 0.0,
                "committed_at": time.time(),
            }])
        return self.read_stage(stage)

    def throughput_report(self) -> DataFrame:
        """Per-stage docs/sec + failure totals from lineage rows — the
        MetricsKeeper analog (olmocr/olmocr/metrics.py:7-100, A12)."""
        lin = self.lineage()
        return (
            lin.groupBy("stage")
            .agg(F.sum("doc_count").alias("docs"),
                 F.sum("bytes").alias("bytes"),
                 F.sum("n_failed").alias("n_failed"),
                 F.sum("elapsed_sec").alias("cpu_stage_sec"),
                 F.round(F.sum("doc_count") / F.sum("elapsed_sec"), 2)
                 .alias("docs_per_sec_serial"))
        )

    def read_stage(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, stage))

    def lineage(self) -> DataFrame:
        return self.spark.read.json(self._lineage_path())
