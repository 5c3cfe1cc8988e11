"""Metric computation + report aggregations (SURVEY §2.6 A1-A10).

All aggregation is native Spark SQL; Python appears only in the TEDS
tree-edit UDF and the table-normalization UDF.  Parity targets:

* Edit_dist — `Levenshtein(pred, gt)/max(len)` per sample, three
  aggregates (metrics 2/cal_metric.py:139-184): page-weighted mean of
  per-page sum(edit)/sum(upper_len) (`ALL_page_avg`), global sum ratio
  (`edit_whole`), sample mean (`edit_sample_avg`).  The per-sample
  distance uses Spark's built-in ``levenshtein`` — whole metric stays
  JVM-side.
* TEDS / TEDS_structure_only — sample mean per group
  (cal_metric.py:36-96), scores from operators/teds.py.
* Attribute-group means (metrics 2/show_result.py:22-49) — explode
  gt_attribute maps, mean + count per "k: v" label.
* Page-attribute split (show_result.py:83-139) — rows x (ALL + page
  attrs + special issues); Edit_dist aggregates page-weighted, others
  page mean -> attribute mean.
* Overall = ((1-text_ED)*100 + (1-formula_ED)*100 + TEDS*100)/3
  (tools/generate_result_tables_final.ipynb).

Table-format arbitration (end2end_dataset.py:218-234): the only global
decision — latex wins when the latex match stream outnumbers html; the
losing latex stream is folded in as pred-empty rows.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.normalize import normalized_table
from .teds import teds_score


def _norm_table_udf(fmt: str):
    def _batch(s: pd.Series) -> pd.Series:
        return s.map(lambda x: normalized_table(x, fmt) if x else "")

    return F.pandas_udf(_batch, "string")


def arbitrate_tables(matches: DataFrame) -> DataFrame:
    """Pick the winning table stream by global count (J7) and normalize.

    Returns the matches DataFrame with table rows unified under
    element_class='table' and norm_gt/norm_pred rewritten by N4/N5.
    """
    counts = {
        r["element_class"]: r["n"]
        for r in matches.filter(F.col("element_class").isin("table_latex", "table_html"))
        .groupBy("element_class").count().withColumnRenamed("count", "n").collect()
    }
    n_latex = counts.get("table_latex", 0)
    n_html = counts.get("table_html", 0)
    non_table = matches.filter(~F.col("element_class").isin("table_latex", "table_html"))
    if n_latex > n_html:
        tables = matches.filter(F.col("element_class") == "table_latex")
        fmt = "latex"
    else:
        html_side = matches.filter(F.col("element_class") == "table_html")
        # losing latex matches fold in as unmatched (pred blanked, edit 1)
        latex_side = (
            matches.filter(F.col("element_class") == "table_latex")
            .withColumn("pred", F.lit(""))
            .withColumn("norm_pred", F.lit(""))
            .withColumn("pred_category", F.lit(""))
            .withColumn("edit", F.lit(1.0))
        )
        tables = html_side.unionByName(latex_side)
        fmt = "html"
    tables = (
        tables.withColumn("element_class", F.lit("table"))
        .withColumn("norm_gt", _norm_table_udf("html")(F.col("gt")))
        .withColumn("norm_pred", _norm_table_udf(fmt)(F.col("pred")))
    )
    return non_table.unionByName(tables)


def _eff(col: str, fallback: str):
    """Reference convention: norm field when non-empty else raw field."""
    c = F.col(col)
    return F.when(c.isNotNull() & (F.length(c) > 0), c).otherwise(
        F.coalesce(F.col(fallback), F.lit("")))


def score_samples(matches: DataFrame, with_teds: bool = True,
                  teds_partitions: int | None = None) -> DataFrame:
    """Add per-sample metric columns: upper_len, edit_num, edit_dist,
    teds, teds_struct (tables only).

    ``teds_partitions``: explicit partition count for the TEDS Python
    stage.  Table rows are a small minority of matches, so at
    benchmark/fixture scale the per-partition Python-worker round trip
    dominates the stage (56 tables across 32 partitions = 32 worker
    hops for ~1.5 core-seconds of scoring); the harness passes 8.
    Leave None at corpus scale — there the inherited partitioning is
    the parallelism the tables actually need."""
    df = (
        matches.withColumn("_gt_eff", _eff("norm_gt", "gt"))
        .withColumn("_pred_eff", _eff("norm_pred", "pred"))
        .withColumn("upper_len", F.greatest(F.length("_gt_eff"), F.length("_pred_eff")))
        .withColumn("edit_num", F.levenshtein("_gt_eff", "_pred_eff"))
        .withColumn(
            "edit_dist",
            F.when(F.col("upper_len") > 0,
                   F.col("edit_num") / F.col("upper_len")).otherwise(F.lit(None)),
        )
    )
    if with_teds:
        def _teds_batch(it):
            for pdf in it:
                scores = [
                    teds_score(p or "", g or "")
                    for p, g in zip(pdf["_pred_eff"], pdf["_gt_eff"])
                ]
                structs = [
                    teds_score(p or "", g or "", structure_only=True)
                    for p, g in zip(pdf["_pred_eff"], pdf["_gt_eff"])
                ]
                pdf = pdf.assign(teds=pd.array(scores, dtype="float64"),
                                 teds_struct=pd.array(structs, dtype="float64"))
                yield pdf

        schema = T.StructType(
            df.schema.fields
            + [T.StructField("teds", T.DoubleType()), T.StructField("teds_struct", T.DoubleType())]
        )
        # only table rows enter the Python stage: TEDS ignores every
        # other element class, but a whole-frame mapInPandas would ship
        # ALL rows (with their long normalized-text columns) through
        # Arrow both ways — on the eval fixtures that serialization was
        # most of the stage's wall time.  Non-table rows take the
        # JVM-only branch with null scores; downstream consumers are
        # aggregates, so the union's row order is irrelevant.
        is_table = F.col("element_class").eqNullSafe("table")
        tab = df.where(is_table)
        if teds_partitions:
            tab = tab.repartition(teds_partitions)
        tables = tab.mapInPandas(_teds_batch, schema)
        others = (df.where(~is_table)
                  .withColumn("teds", F.lit(None).cast("double"))
                  .withColumn("teds_struct", F.lit(None).cast("double")))
        df = tables.unionByName(others)
    return df.drop("_gt_eff", "_pred_eff")


def edit_dist_report(scored: DataFrame) -> DataFrame:
    """Three Edit_dist aggregates per element_class (cal_metric.py:159-184)."""
    per_page = (
        scored.filter(F.col("upper_len") > 0)
        .groupBy("element_class", "img_id")
        .agg((F.sum("edit_num") / F.sum("upper_len")).alias("page_ratio"),
             F.sum("edit_num").alias("page_edit"),
             F.sum("upper_len").alias("page_len"),
             F.avg("edit_dist").alias("page_sample_avg"),
             F.count(F.lit(1)).alias("n_samples"))
    )
    return (
        per_page.groupBy("element_class")
        .agg(
            F.avg("page_ratio").alias("page_avg_edit"),
            (F.sum("page_edit") / F.sum("page_len")).alias("edit_whole"),
            (F.sum(F.col("page_sample_avg") * F.col("n_samples")) / F.sum("n_samples")
             ).alias("edit_sample_avg"),
            F.sum("n_samples").alias("n_samples"),
        )
        .orderBy("element_class")
    )


def teds_report(scored: DataFrame) -> DataFrame:
    """Sample-mean TEDS for the table stream (cal_metric.py:80-96)."""
    return (
        scored.filter(F.col("element_class") == "table")
        .agg(F.avg("teds").alias("teds"),
             F.avg("teds_struct").alias("teds_structure_only"),
             F.count(F.lit(1)).alias("n_tables"))
    )


def text_metric_report(matches: DataFrame,
                       group_col: str = "element_class") -> DataFrame:
    """Corpus BLEU + mean METEOR per group (cal_metric.py:99-137 —
    call_BLEU / call_METEOR evaluate per group over norm-effective
    gt/pred).  Grouping and shuffle are Spark's; the scoring loop runs
    in applyInPandas workers like the reference's per-group HF calls.
    Note the reference passes predictions=gt, references=pred (its
    argument swap) — scores are computed gt-as-hypothesis to match."""
    from ..functions.bleu import corpus_bleu
    from ..functions.meteor import corpus_meteor

    d = (matches.withColumn("_gt_eff", _eff("norm_gt", "gt"))
         .withColumn("_pred_eff", _eff("norm_pred", "pred"))
         .select(F.col(group_col).alias("group"), "_gt_eff", "_pred_eff"))

    schema = T.StructType([
        T.StructField("group", T.StringType()),
        T.StructField("bleu", T.DoubleType()),
        T.StructField("meteor", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ])

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        gts = [g or "" for g in pdf["_gt_eff"]]
        preds = [p or "" for p in pdf["_pred_eff"]]
        return pd.DataFrame([{
            "group": pdf["group"].iloc[0],
            "bleu": corpus_bleu(gts, preds),
            "meteor": corpus_meteor(gts, preds),
            "n_samples": len(pdf),
        }])

    return d.groupBy("group").applyInPandas(_score, schema).orderBy("group")


def attribute_report(scored: DataFrame, metric_col: str = "edit_dist") -> DataFrame:
    """Mean score + count per gt_attribute 'k: v' label (A7)."""
    exploded = (
        scored.filter(F.col("gt_attribute").isNotNull())
        .select("element_class", metric_col, F.explode("gt_attribute").alias("attr"))
        .select("element_class", metric_col, F.explode("attr").alias("k", "v"))
        .select(
            "element_class",
            F.concat_ws(": ", "k", "v").alias("attribute"),
            F.col(metric_col).alias("score"),
        )
        .filter(F.col("score").isNotNull())
    )
    return (
        exploded.groupBy("element_class", "attribute")
        .agg(F.avg("score").alias("mean_score"), F.count(F.lit(1)).alias("sample_count"))
        .orderBy("element_class", "attribute")
    )


def page_split_report(scored: DataFrame, page_attrs: DataFrame) -> DataFrame:
    """ALL + per-page-attribute rows; Edit_dist page-weighted (A8).

    page_attrs: (img_id, page_attribute map<string,string>,
    special_issue array<string>).  The explode+union re-expresses the
    reference's row multiplication; 'ALL' covers the ungrouped total —
    the GROUPING SETS ((), (attribute)) pattern.
    """
    attr_rows = (
        page_attrs.select("img_id", F.explode("page_attribute").alias("k", "v"))
        .select("img_id", F.concat_ws(": ", "k", "v").alias("attribute"))
    )
    issue_rows = (
        page_attrs.select("img_id", F.explode("special_issue").alias("attribute"))
        .filter(~F.col("attribute").contains("table"))
    )
    all_rows = page_attrs.select("img_id", F.lit("ALL").alias("attribute"))
    page_attr_long = all_rows.unionByName(attr_rows).unionByName(issue_rows)

    joined = scored.filter(F.col("upper_len") > 0).join(
        F.broadcast(page_attr_long), "img_id")
    per_page = (
        joined.groupBy("element_class", "attribute", "img_id")
        .agg((F.sum("edit_num") / F.sum("upper_len")).alias("page_weighted"))
    )
    return (
        per_page.groupBy("element_class", "attribute")
        .agg(F.avg("page_weighted").alias("edit_dist"),
             F.count(F.lit(1)).alias("page_count"))
        .orderBy("element_class", "attribute")
    )


def cdm_export(scored: DataFrame) -> DataFrame:
    """CDM_plain (metrics 2/cal_metric.py:318-337): the reference's CDM
    entry exports cleaned formula pairs for an external CDM evaluator
    rather than scoring in-process.  Same cleanup as columns:
    strip $$ wrappers and ```latex fences, sequential ids."""
    from pyspark.sql import Window

    formulas = scored.filter(F.col("element_class") == "display_formula")
    clean = lambda c: F.trim(F.regexp_replace(  # noqa: E731
        F.regexp_replace(c, r"^\$\$+", ""), r"\$\$+$", ""))
    pred_body = F.regexp_extract(
        F.coalesce(F.col("pred"), F.lit("")),
        r"(?s)(?:```latex)?([^`]*)(?:```)?", 1)
    w = Window.orderBy("img_id", "pred_position")
    return (
        formulas.withColumn("_seq", F.row_number().over(w) - 1)
        .select(
            F.col("img_id").alias("img_name"),
            clean(F.coalesce(F.col("gt"), F.lit(""))).alias("gt"),
            clean(pred_body).alias("pred"),
            F.col("_seq").cast("string").alias("img_id"),
        )
    )


def write_cdm_export(scored: DataFrame, path: str) -> None:
    """Driver-side JSON sink (S10 scale: one small file per run)."""
    import json

    rows = [r.asDict() for r in cdm_export(scored).collect()]
    with open(path, "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=4, ensure_ascii=False)


def overall_score(edit_report_rows: list, teds_row) -> Optional[float]:
    """((1-text_ED)*100 + (1-formula_ED)*100 + TEDS*100)/3 (A10)."""
    by_class = {r["element_class"]: r for r in edit_report_rows}
    text = by_class.get("text_block")
    formula = by_class.get("display_formula")
    if text is None or formula is None or teds_row is None:
        return None
    return (
        (1 - text["page_avg_edit"]) * 100
        + (1 - formula["page_avg_edit"]) * 100
        + (teds_row["teds"] or 0) * 100
    ) / 3
