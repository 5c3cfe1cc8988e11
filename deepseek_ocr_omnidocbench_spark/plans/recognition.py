"""Recognition-task evaluation (SURVEY §3 side tasks; dataset/
recog_dataset.py): block-granularity gt/pred pairs scored without bbox
matching — normalize per category, per-sample edit distance, grouped
aggregates.

Categories map to the normalizers exactly as the reference does
(recog_dataset.py:77-88): text -> clean_string(textblock2unicode),
formula -> normalized_formula, table -> normalized_table; the
formula-line variant additionally applies the iterated whitespace
normalizer (recog_dataset.py:148-163), ported as
``recog_formula_normalize``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import (
    clean_string,
    normalized_formula,
    normalized_table,
    textblock2unicode,
)

_TEXT_REG = r"(\\(operatorname|mathrm|text|mathbf)\s?\*? {.*?})"
_LETTER = "[a-zA-Z]"
_NOLETTER = r"[\W_^\d]"


def recog_formula_normalize(text: str) -> str:
    """Whitespace removal for LaTeX lines (recog_dataset.py:148-163):
    collapse spaces inside \\operatorname-style macros, then iterate
    boundary-whitespace deletion to a fixed point."""
    names = [x[0].replace(" ", "") for x in re.findall(_TEXT_REG, text)]
    text = re.sub(_TEXT_REG, lambda m: str(names.pop(0)), text)
    news = text
    while True:
        text = news
        news = re.sub(r"(?!\\ )(%s)\s+?(%s)" % (_NOLETTER, _NOLETTER), r"\1\2", text)
        news = re.sub(r"(?!\\ )(%s)\s+?(%s)" % (_NOLETTER, _LETTER), r"\1\2", news)
        news = re.sub(r"(%s)\s+?(%s)" % (_LETTER, _NOLETTER), r"\1\2", news)
        if news == text:
            break
    return text


def _normalize(category: str, value: str) -> str:
    if category == "text":
        return clean_string(textblock2unicode(value))
    if category == "formula":
        return normalized_formula(value)
    if category == "formula_line":
        return recog_formula_normalize(value)
    if category in ("table", "html_table"):
        return normalized_table(value, "html")
    if category == "latex_table":
        return normalized_table(value, "latex")
    return value


def norm_pair_udf():
    def _batch(cat: pd.Series, val: pd.Series) -> pd.Series:
        return pd.Series([_normalize(c, v or "") for c, v in zip(cat, val)])

    return F.pandas_udf(_batch, "string")


def score_recognition(pairs: DataFrame) -> DataFrame:
    """pairs(img_id, category_type, gt, pred) -> + norm/edit columns.

    Edit distance runs on the JVM (native levenshtein over the
    normalized strings) — no Python in the scoring hot path."""
    u = norm_pair_udf()
    d = (
        pairs.withColumn("norm_gt", u(F.col("category_type"), F.col("gt")))
        .withColumn("norm_pred", u(F.col("category_type"), F.col("pred")))
        .withColumn("upper_len", F.greatest(F.length("norm_gt"), F.length("norm_pred")))
        .withColumn("edit_num", F.levenshtein("norm_gt", "norm_pred"))
    )
    return d.withColumn(
        "edit_dist",
        F.when(F.col("upper_len") > 0, F.col("edit_num") / F.col("upper_len"))
        .otherwise(F.lit(0.0)))


def recognition_report(scored: DataFrame) -> DataFrame:
    """Per-category sample-average + overall edit distance."""
    return (
        scored.groupBy("category_type")
        .agg(F.round(F.avg("edit_dist"), 6).alias("edit_sample_avg"),
             F.round(F.sum("edit_num") / F.sum("upper_len"), 6).alias("edit_whole"),
             F.count(F.lit(1)).alias("n_samples"))
        .orderBy("category_type")
    )
