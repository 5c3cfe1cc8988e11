"""ROUGE-N: word n-gram recall/precision/F1 (Lin, ACL 2004 WAS) —
relational, pure Columns.

The fourth member of the text-similarity metric family next to BLEU
(functions/bleu.py), METEOR (functions/meteor.py) and chrF
(functions/chrf.py).  Where BLEU is precision-oriented with a brevity
penalty, ROUGE-N is the recall-oriented summary/extraction metric:

    R_n = clipped-match(n) / total-ref-ngrams(n)
    P_n = clipped-match(n) / total-hyp-ngrams(n)
    F_n = 2 * P_n * R_n / (P_n + R_n)

with clipped matches = sum over gram types of min(hyp_count,
ref_count) — the multiset-intersection convention shared with BLEU's
modified precision and chrF's chrP/chrR.

Like chrF (and unlike the BLEU/METEOR Python kernels), ROUGE-N is a
pure counting metric, so the implementation is all Spark Columns:
word-n-gram explode -> (id, n, gram) count aggregation on both sides
-> one full-outer join -> per-(id, n) clipped aggregates -> pivot to
rouge1/rouge2 columns.  Everything stays in whole-stage codegen and
replays exactly in the DuckDB oracle.

Scale shape: the exploded frame is ~(n_max)x corpus tokens, shuffled
once on uniform (id, n, gram) keys; the final fold is an ordinary
per-id agg.  No Python workers.

Reference behavior sources (what to compute, not how): the evaluation
harness reports text-similarity metrics per document/group
(OmniDocBench ``metrics 2/`` family); ROUGE-N extends that family for
summary-style extraction QA at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_ngrams(words_col: str, n: int) -> Column:
    """Array of space-joined word n-grams of an array<string> column.

    Guarded by a size CASE: Spark's sequence(1, 0) DESCENDS rather
    than returning empty (the chrF phantom-n-gram trap)."""
    if n == 1:
        return F.col(words_col)
    return F.expr(
        f"case when size({words_col}) >= {n} then"
        f" transform(sequence(1, size({words_col}) - {n} + 1),"
        f" i -> array_join(slice({words_col}, i, {n}), ' '))"
        f" else cast(array() as array<string>) end")


def _tokens(c: Column) -> Column:
    """Lowercase alphanumeric word split — mirrors the corpus-wide
    tokenization convention (textstats._word_array / _AZ09_WORDS)."""
    return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"),
                    lambda w: F.length(w) > 0)


def _ngram_counts(df: DataFrame, id_col: str, text_col: str,
                  out: str, n_max: int) -> DataFrame:
    """(id, n, gram, count) for n = 1..n_max over one text side."""
    toks = df.select(F.col(id_col).alias("_id"),
                     _tokens(F.col(text_col)).alias("_w"))
    per_n = [toks.select("_id", F.lit(n).alias("n"),
                         F.explode(_word_ngrams("_w", n)).alias("gram"))
             for n in range(1, n_max + 1)]
    un = per_n[0]
    for p in per_n[1:]:
        un = un.unionByName(p)
    return (un.groupBy("_id", "n", "gram")
            .agg(F.count(F.lit(1)).alias(out)))


def rouge_n_scores(df: DataFrame, hyp_col: str, ref_col: str,
                   id_col: str = "doc_id", n_max: int = 2,
                   round_to: int = 6) -> DataFrame:
    """Per-row ROUGE-N -> (id, rouge{n}_p, rouge{n}_r, rouge{n}_f for
    each n in 1..n_max).  A row where a side has no n-grams of order n
    scores 0.0 for that order (the rouge-score package convention);
    rows absent from both count tables still emit all-zero rows via
    the left join back onto ``df``."""
    hyp = _ngram_counts(df, id_col, hyp_col, "ch", n_max)
    ref = _ngram_counts(df, id_col, ref_col, "cr", n_max)
    joined = hyp.join(ref, ["_id", "n", "gram"], "full_outer")
    per_order = (joined.groupBy("_id", "n")
                 .agg(F.sum(F.least(F.coalesce("ch", F.lit(0)),
                                    F.coalesce("cr", F.lit(0))))
                      .alias("m"),
                      F.sum(F.coalesce("ch", F.lit(0))).alias("th"),
                      F.sum(F.coalesce("cr", F.lit(0))).alias("tr")))
    p = F.when(F.col("th") > 0,
               F.col("m") / F.col("th")).otherwise(F.lit(0.0))
    r = F.when(F.col("tr") > 0,
               F.col("m") / F.col("tr")).otherwise(F.lit(0.0))
    scored = per_order.select(
        "_id", "n", p.alias("p"), r.alias("r"),
        F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
        .alias("f"))
    cols = []
    for n in range(1, n_max + 1):
        for m in ("p", "r", "f"):
            cols.append(F.round(F.coalesce(
                F.max(F.when(F.col("n") == n, F.col(m))),
                F.lit(0.0)), round_to).alias(f"rouge{n}_{m}"))
    per_id = scored.groupBy("_id").agg(*cols)
    base = df.select(F.col(id_col).alias("_id"))
    return (base.join(per_id, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    *[F.round(F.coalesce(F.col(c), F.lit(0.0)), round_to)
                      .alias(c)
                      for n in range(1, n_max + 1)
                      for c in (f"rouge{n}_p", f"rouge{n}_r",
                                f"rouge{n}_f")]))
