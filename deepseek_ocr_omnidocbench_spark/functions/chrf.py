"""chrF: character n-gram F-score (Popović, WMT 2015) — relational.

The third member of the text-similarity metric family next to BLEU
(functions/bleu.py) and METEOR (functions/meteor.py), and the one that
needs no tokenizer — which is why WMT adopted it as the
language-agnostic default.  Definition (chrF2, the standard):

    chrP = mean over n=1..6 of  clipped-match(n) / total-hyp-ngrams(n)
    chrR = mean over n=1..6 of  clipped-match(n) / total-ref-ngrams(n)
    chrF = (1 + beta^2) * chrP * chrR / (beta^2 * chrP + chrR),  beta=2

with whitespace removed before n-gram extraction and clipped matches
= sum over gram types of min(hyp_count, ref_count).

Unlike the BLEU/METEOR kernels (Python inside applyInPandas — those
metrics' per-sentence alignment logic doesn't decompose), chrF is a
*pure counting* metric, so this implementation is all Spark Columns:
n-gram explode -> (id, n, gram) count aggregation on both sides ->
one full-outer join -> two nested aggs.  Everything stays in
whole-stage codegen and replays exactly in the DuckDB oracle.

Scale shape: the exploded frame is ~6x corpus characters — the same
work any chrF implementation does, here shuffled once on uniform
(id, n, gram) keys; per-order totals and the final per-doc fold are
ordinary aggs.  No Python workers at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _char_ngrams(col: str, n: int) -> Column:
    """Array of character n-grams of the whitespace-stripped string.

    Guarded by a length CASE: Spark's sequence(1, 0) DESCENDS ([1, 0])
    rather than returning empty, which would fabricate phantom n-grams
    for strings shorter than n."""
    return F.expr(
        f"case when length({col}) >= {n} then"
        f" transform(sequence(1, length({col}) - {n} + 1),"
        f" i -> substring({col}, i, {n}))"
        f" else cast(array() as array<string>) end")


def _ngram_counts(df: DataFrame, id_col: str, text_col: str,
                  out: str, n_max: int) -> DataFrame:
    """(id, n, gram, c) counts for n = 1..n_max over one text side."""
    stripped = df.select(
        F.col(id_col).alias("_id"),
        F.regexp_replace(F.col(text_col), r"\s+", "").alias("_s"))
    per_n = [stripped.select(
        "_id", F.lit(n).alias("n"),
        F.explode(_char_ngrams("_s", n)).alias("gram"))
        for n in range(1, n_max + 1)]
    un = per_n[0]
    for p in per_n[1:]:
        un = un.unionByName(p)
    return (un.groupBy("_id", "n", "gram")
            .agg(F.count(F.lit(1)).alias(out)))


def chrf_scores(df: DataFrame, hyp_col: str, ref_col: str,
                id_col: str = "doc_id", n_max: int = 6,
                beta: float = 2.0) -> DataFrame:
    """Per-row chrF -> (id, chrf).  Rows where either side has no
    n-grams of any order (empty after whitespace strip) score 0.0,
    matching sacrebleu's convention."""
    hyp = _ngram_counts(df, id_col, hyp_col, "ch", n_max)
    ref = _ngram_counts(df, id_col, ref_col, "cr", n_max)
    joined = hyp.join(ref, ["_id", "n", "gram"], "full_outer")
    per_order = (joined.groupBy("_id", "n")
                 .agg(F.sum(F.least(F.coalesce("ch", F.lit(0)),
                                    F.coalesce("cr", F.lit(0))))
                      .alias("m"),
                      F.sum(F.coalesce("ch", F.lit(0))).alias("th"),
                      F.sum(F.coalesce("cr", F.lit(0))).alias("tr")))
    # orders where a side is absent contribute 0 to that side's mean
    # over ALL n_max orders (sacrebleu: effective order only when the
    # hyp is shorter than n; we mirror its default epsilon-free form
    # for orders both sides realize, skipping unrealized orders).
    avail = per_order.where((F.col("th") > 0) & (F.col("tr") > 0))
    pr = (avail.groupBy("_id")
          .agg(F.avg(F.col("m").cast("double")
                     / F.col("th").cast("double")).alias("p"),
               F.avg(F.col("m").cast("double")
                     / F.col("tr").cast("double")).alias("r")))
    b2 = float(beta) * float(beta)
    f = F.when((F.col("p") + F.col("r")) > 0,
               (F.lit(1.0 + b2) * F.col("p") * F.col("r"))
               / (F.lit(b2) * F.col("p") + F.col("r"))) \
        .otherwise(F.lit(0.0))
    return (df.select(F.col(id_col).alias("_id"))
            .join(pr, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce(f, F.lit(0.0)).alias("chrf")))
