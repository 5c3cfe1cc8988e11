"""The north-star extraction pipeline: Common-Crawl-style pages table ->
filtered -> per-page extraction -> assembled documents, every stage
checkpointed with per-partition lineage so a killed job resumes.

Re-expresses the olmocr worker topology (olmocr/olmocr/pipeline.py:
508-590: work queue -> per-PDF filter -> per-page extract -> doc
assembly -> Dolma sink) as three Spark stages:

  stage ``filtered``   F3/F4 predicates (prunable Column filters)
  stage ``page_md``    content sniff (%PDF vs HTML) -> pandas UDF ->
                       explode per page; big-blob round-robin routing
  stage ``documents``  window-offset span assembly (A14) + F8 fallback
                       cut + quality columns; sha1 doc ids

The work-queue/locking layer (work_queue.py:30-225) is replaced by
StageCheckpoint's bucket lineage + anti-join resume (sources/lineage.py).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.assemble import assemble_documents
from ..operators.filters import is_form_pdf, language_keep, page_quality_keep
from ..operators.html_extract import BIG_BLOB_BYTES, extract_markdown
from ..operators.pdf_extract import extract_pdf_pages
from ..operators.textstats import lang_id_col, quality_cols
from ..sources.lineage import StageCheckpoint

PAGE_MD_TYPE = T.ArrayType(T.StructType([
    T.StructField("page", T.IntegerType()),
    T.StructField("md", T.StringType()),
]))


def _extract_any(blob: Optional[bytes]) -> Optional[list]:
    """Dispatch on magic bytes: PDF -> one entry per page, HTML -> one.

    A failing row yields ``[(0, None)]`` (NULL md) rather than raising:
    one poisoned blob must not kill a task at 10^12 rows; the NULL is
    counted into the lineage failure metrics (run_stage failure_col)."""
    if blob is None:
        return None
    try:
        b = bytes(blob)
        if b.startswith(b"%PDF"):
            pages = extract_pdf_pages(b) or []
            return [(i, md) for i, md in enumerate(pages)]
        md = extract_markdown(b.decode("utf-8", errors="replace"))
        return [(0, md if md is not None else "")]
    except Exception:
        return [(0, None)]


def extract_any_udf():
    def _batch(blob: pd.Series) -> pd.Series:
        return blob.map(_extract_any)

    return F.pandas_udf(_batch, PAGE_MD_TYPE)


def stage_filter(pages: DataFrame) -> DataFrame:
    """F3 form-PDF drop + F4 language keep — pure predicates, pushed to
    the scan by Catalyst (PushedFilters for ``lang`` on parquet).

    NULL html must flow through: ``~is_form_pdf(NULL)`` is SQL NULL and
    where() would silently drop the row before stage_page_md's isNull()
    routing and the lineage failure counters ever see it — coalesce to
    keep NULL-blob rows."""
    return pages.where(language_keep(F.col("lang"), keep=("en", "zh", "de", None))
                       & ~F.coalesce(is_form_pdf(F.col("html")), F.lit(False)))


def stage_page_md(pages: DataFrame, salt_buckets: int = 0,
                  big_blob_bytes: int = BIG_BLOB_BYTES) -> DataFrame:
    """-> (url, page, md): the heavy UDF stage, skew-routed like
    html_extract.extract_pages (giants round-robin, small salted)."""
    sel = lambda df: df.select(  # noqa: E731
        "url", F.explode(extract_any_udf()(F.col("html"))).alias("pm"))
    if salt_buckets:
        is_big = F.length("html") >= big_blob_bytes
        small = pages.where(~is_big | F.col("html").isNull()).repartition(
            salt_buckets, F.pmod(F.xxhash64("url"), F.lit(salt_buckets)))
        big = pages.where(is_big).repartition(salt_buckets * 2)
        exploded = sel(small).unionByName(sel(big))
    else:
        exploded = sel(pages)
    return exploded.select("url", F.col("pm.page").alias("page"),
                           F.col("pm.md").alias("md"))


def stage_documents(page_md: DataFrame) -> DataFrame:
    """Assembly + annotations + post-extraction quality cut."""
    docs = assemble_documents(page_md)
    q = quality_cols(F.col("markdown"))
    docs = docs.select(
        "url", "doc_id", "markdown", "page_spans", "n_pages",
        F.length("markdown").alias("n_chars"),
        lang_id_col(F.col("markdown")).alias("lang_pred"),
        F.round(q["quality_score"], 6).alias("quality_score"),
    )
    return docs.where(page_quality_keep(F.col("markdown")))


def run_pipeline(spark: SparkSession, pages: DataFrame, checkpoint_root: str,
                 n_buckets: int = 16, salt_buckets: int = 0) -> DataFrame:
    """Checkpointed end-to-end run; restart-safe per stage bucket."""
    ck = StageCheckpoint(spark, checkpoint_root, n_buckets=n_buckets)
    filtered = ck.run_stage("filtered", pages, stage_filter)
    page_md = ck.run_stage(
        "page_md", filtered,
        lambda df: stage_page_md(df, salt_buckets=salt_buckets),
        failure_col="md")
    docs = ck.run_stage("documents", page_md, stage_documents)
    return docs


def run_pipeline_inline(pages: DataFrame, salt_buckets: int = 0) -> DataFrame:
    """Same dataflow without checkpoints (benchmarks, small runs)."""
    return stage_documents(stage_page_md(stage_filter(pages),
                                         salt_buckets=salt_buckets))
