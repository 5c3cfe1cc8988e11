"""Iceberg deployment path for the stage-checkpoint protocol.

The sandbox ships no iceberg-spark runtime jar, so `StageCheckpoint`
(lineage.py) implements the protocol on plain parquet + atomic renames.
This module is the 1:1 mapping onto Iceberg for the real cluster —
capability-gated so the rest of the engine never depends on the jar:

| parquet stand-in (lineage.py)      | Iceberg (here)                      |
|------------------------------------|-------------------------------------|
| bucket dir write + os.rename       | `writeTo(table).append()` snapshot  |
| lineage-*.json append              | `lineage` table append              |
| committed_buckets set difference   | anti-join against lineage snapshot  |
| restart-safe bucket granularity    | same salt-bucket column             |
| done-flag atomicity                | Iceberg snapshot commit atomicity   |

At 10^12 docs the additional wins are metadata-level: partition pruning
on the bucket column, snapshot time travel for debugging a bad stage,
and `expire_snapshots` for retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable in this session."""
    try:
        # py4j resolves missing classes to lazy package objects, so a
        # plain attribute probe never fails — ask the classloader
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.Snapshot")
        return True
    except Exception:
        return False


class IcebergStageCheckpoint:
    """StageCheckpoint contract over Iceberg tables.

    ``catalog.namespace`` must point at a configured Iceberg catalog
    (spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog).
    Raises a clear error at construction when the runtime jar is absent
    so callers fall back to the parquet implementation explicitly.
    """

    def __init__(self, spark: SparkSession, namespace: str,
                 n_buckets: int = 16, key_col: str = "url"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use "
                "sources.lineage.StageCheckpoint (parquet protocol) instead")
        self.spark = spark
        self.namespace = namespace
        self.n_buckets = n_buckets
        self.key_col = key_col
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {namespace}.lineage "
            "(stage string, partition_id int, doc_count bigint, bytes bigint, "
            "n_failed bigint, failure_urls array<string>, elapsed_sec double, "
            "committed_at timestamp) USING iceberg")

    def bucket_of(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_bucket",
            F.pmod(F.xxhash64(self.key_col), F.lit(self.n_buckets)).cast("int"))

    def committed_buckets(self, stage: str) -> set[int]:
        rows = self.spark.sql(
            f"SELECT DISTINCT partition_id FROM {self.namespace}.lineage "
            f"WHERE stage = '{stage}'").collect()
        return {r["partition_id"] for r in rows}

    def run_stage(self, stage: str, inp: DataFrame, transform) -> DataFrame:
        """Same per-bucket loop as the parquet protocol.

        Idempotency: lineage is appended *after* the data commit, so a
        crash between them re-runs the bucket on restart.  The data
        write must therefore be a replace, not an append — the stage
        table is partitioned by ``_bucket`` and each bucket commits via
        ``overwritePartitions()``, which atomically swaps exactly that
        bucket's partition.  Re-running a half-committed bucket replaces
        its rows instead of duplicating them (the parquet protocol gets
        the same property from tmp-write + atomic rename).
        """
        import time

        table = f"{self.namespace}.{stage}"
        done = self.committed_buckets(stage)
        bucketed = self.bucket_of(inp)
        for b in sorted(set(range(self.n_buckets)) - done):
            t0 = time.monotonic()
            part = bucketed.where(F.col("_bucket") == b).drop("_bucket")
            out = transform(part).withColumn("_bucket", F.lit(b))
            # Create whenever absent (a retried bucket b != 0 may be the
            # first writer if the table was dropped between runs).
            if stage not in self._existing_tables():
                out.writeTo(table).partitionedBy("_bucket").create()
            else:
                out.writeTo(table).overwritePartitions()
            n = self.spark.table(table).where(F.col("_bucket") == b).count()
            elapsed = time.monotonic() - t0
            self.spark.createDataFrame(
                [(stage, b, n, 0, 0, [], elapsed)],
                "stage string, partition_id int, doc_count bigint, bytes bigint, "
                "n_failed bigint, failure_urls array<string>, elapsed_sec double",
            ).withColumn("committed_at", F.current_timestamp()) \
                .writeTo(f"{self.namespace}.lineage").append()
        return self.spark.table(table).drop("_bucket")

    def _existing_tables(self) -> set[str]:
        rows = self.spark.sql(f"SHOW TABLES IN {self.namespace}").collect()
        return {r["tableName"] for r in rows}
