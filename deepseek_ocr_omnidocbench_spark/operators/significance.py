"""Paired significance testing for system comparison (SURVEY §2.6
A13 siblings): paired bootstrap resampling (Koehn, EMNLP 2004), the
McNemar exact-count test, and Cohen's kappa inter-annotator agreement.

The reference ships a two-proportion z-test
(OmniDocBench/scripts/p_test_calc.py:1-10) for its DeepSeek-vs-olmOCR
comparison; these operators add the per-document paired designs that
test the SAME pages under two systems — the statistically right tool
when both systems run on one benchmark, and the standard rigor bar for
"extractor A beats extractor B" claims over a shared corpus.

Engine-portable exactness discipline (the calibration/retrieval_eval
precedent): per-document metrics are required to be INTEGER-valued
(edit-distance numerators, pass flags, rule-hit counts — every gate
metric in this repo already is), so every aggregate is an exact bigint
sum in any summation order; doubles appear only in single final
divisions on identical operands in both engines.

Scale shape: the bootstrap's replicate table is b_reps x n rows of
pure integer arithmetic (no data movement — documents join in by a
dense rank id), one groupBy on the replicate id; at corpus scale you
bootstrap over per-shard aggregate rows, not raw documents, so n stays
bounded.  McNemar and kappa are single map-side-combinable aggregates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _draw(seed: str, b_col, i_col, n_col):
    """Deterministic md5 draw in [0, n): same expression renders in
    DuckDB as ('0x'||substr(md5(...),1,12))::bigint % n (the
    stratified_sample convention — md5 hex is engine-identical)."""
    key = F.concat_ws(":", F.lit(seed), b_col.cast("string"),
                      i_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 12), 16, 10) \
        .cast("long") % n_col


def paired_bootstrap(per_doc: DataFrame, id_col: str = "doc_id",
                     a_col: str = "metric_a", b_col: str = "metric_b",
                     b_reps: int = 200, seed: str = "boot",
                     conf: float = 0.95) -> DataFrame:
    """Paired bootstrap test for mean(metric_a - metric_b) != 0
    (Koehn 2004 §3: resample documents with replacement, recompute the
    delta per replicate, read significance off the sign distribution).

    Input: one row per document with INTEGER metrics for system A and
    system B on that same document.  Output: ONE row —

      n, b_reps, sum_delta (bigint, observed), mean_delta,
      n_reps_pos / n_reps_neg / n_reps_zero (replicate sign counts),
      p_boot = (#replicates whose delta sign opposes the observed
                sign, zeros counted against) + 1) / (b_reps + 1),
      ci_lo / ci_hi = replicate-mean order statistics at
                ceil(alpha/2 * B) and ceil((1-alpha/2) * B)
                (value-at-rank, interpolation-free).

    Determinism: draw (b, i) -> md5(seed:b:i) mod n over a dense
    row_number rank of the documents — identical replicates in any
    engine, any partitioning, any run.
    """
    alpha = 1.0 - conf
    ranked = per_doc.select(
        (F.row_number().over(Window.orderBy(id_col)) - 1).alias("idx"),
        (F.col(a_col).cast("long") - F.col(b_col).cast("long"))
        .alias("delta"))
    # n = 0 guard: sequence(0, -1) silently DESCENDS (the phantom-
    # sequence trap) and `% 0` throws under ANSI — an empty input
    # yields an empty result instead
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("delta").alias("sum_delta")).where(F.col("n") > 0)
    reps = (stats
            .select("n", "sum_delta",
                    F.explode(F.sequence(F.lit(0), F.lit(b_reps - 1)))
                    .alias("b"))
            .select("n", "sum_delta", "b",
                    F.explode(F.sequence(F.lit(0), F.col("n") - 1))
                    .alias("i"))
            .select("n", "sum_delta", "b",
                    _draw(seed, F.col("b"), F.col("i"), F.col("n"))
                    .alias("idx")))
    rep_sums = (reps.join(ranked, "idx")
                .groupBy("b", "n", "sum_delta")
                .agg(F.sum("delta").alias("rep_sum")))
    lo_rank = max(1, math.ceil(alpha / 2 * b_reps))
    hi_rank = min(b_reps, math.ceil((1 - alpha / 2) * b_reps))
    w = Window.orderBy("rep_sum", "b")
    ranked_reps = rep_sums.withColumn("rk", F.row_number().over(w))
    obs_pos = F.col("sum_delta") > 0
    opposes = F.when(obs_pos, F.col("rep_sum") <= 0) \
        .otherwise(F.col("rep_sum") >= 0)
    return (ranked_reps.groupBy("n", "sum_delta")
            .agg(F.count(F.lit(1)).alias("b_reps"),
                 F.sum(F.when(F.col("rep_sum") > 0, 1).otherwise(0))
                 .cast("long").alias("n_reps_pos"),
                 F.sum(F.when(F.col("rep_sum") < 0, 1).otherwise(0))
                 .cast("long").alias("n_reps_neg"),
                 F.sum(F.when(F.col("rep_sum") == 0, 1).otherwise(0))
                 .cast("long").alias("n_reps_zero"),
                 F.sum(F.when(opposes, 1).otherwise(0))
                 .cast("long").alias("n_opposing"),
                 F.max(F.when(F.col("rk") == lo_rank, F.col("rep_sum")))
                 .alias("lo_sum"),
                 F.max(F.when(F.col("rk") == hi_rank, F.col("rep_sum")))
                 .alias("hi_sum"))
            .select(F.col("n").cast("long").alias("n"),
                    F.col("b_reps").cast("long").alias("b_reps"),
                    F.col("sum_delta").cast("long").alias("sum_delta"),
                    (F.col("sum_delta").cast("double") / F.col("n"))
                    .alias("mean_delta"),
                    "n_reps_pos", "n_reps_neg", "n_reps_zero",
                    ((F.col("n_opposing") + 1).cast("double")
                     / (F.col("b_reps") + 1)).alias("p_boot"),
                    (F.col("lo_sum").cast("double") / F.col("n"))
                    .alias("ci_lo"),
                    (F.col("hi_sum").cast("double") / F.col("n"))
                    .alias("ci_hi")))


def mcnemar(per_doc: DataFrame, a_pass: str = "a_pass",
            b_pass: str = "b_pass") -> DataFrame:
    """McNemar's paired test over per-document pass/fail outcomes of
    two systems: only the discordant counts carry signal.  ONE
    map-side-combinable aggregate; output —

      n, n_both, n_neither,
      n_a_only (A passes, B fails), n_b_only,
      statistic = (n_a_only - n_b_only)^2 / (n_a_only + n_b_only)
      z = (n_a_only - n_b_only) / sqrt(n_a_only + n_b_only)

    both NULL when no discordant pairs exist.  Exact bigints until the
    two single divisions."""
    a = F.col(a_pass).cast("boolean")
    b = F.col(b_pass).cast("boolean")
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(a & b, 1).otherwise(0)).cast("long").alias("n_both"),
        F.sum(F.when(~a & ~b, 1).otherwise(0)).cast("long")
        .alias("n_neither"),
        F.sum(F.when(a & ~b, 1).otherwise(0)).cast("long")
        .alias("n_a_only"),
        F.sum(F.when(~a & b, 1).otherwise(0)).cast("long")
        .alias("n_b_only"))
    d = F.col("n_a_only") - F.col("n_b_only")
    tot = F.col("n_a_only") + F.col("n_b_only")
    return agg.select(
        F.col("n").cast("long").alias("n"), "n_both", "n_neither",
        "n_a_only", "n_b_only",
        F.when(tot > 0, (d * d).cast("double") / tot)
        .alias("statistic"),
        F.when(tot > 0, d.cast("double") / F.sqrt(tot.cast("double")))
        .alias("z"))


def cohens_kappa(items: DataFrame, rater_a: str = "label_a",
                 rater_b: str = "label_b",
                 group_col: str | None = None) -> DataFrame:
    """Cohen's kappa chance-corrected agreement between two annotators
    (the inter-annotator QA check for GT attribute labels like
    language / data_source in the OmniDocBench annotations).

    Single-division exactness: with bigint n, agree, and
    sum_k(marginal_a[k] * marginal_b[k]),

      kappa = (n*agree - sum_prod) / (n*n - sum_prod)

    — po and pe never materialize separately, so the only double op is
    one division of two exact bigints (NULL when the denominator is 0,
    i.e. pe = 1).  Two aggregates on the group key (pairs + per-label
    marginals), both map-side combinable."""
    gcols = [group_col] if group_col else []
    base = items.select(
        *gcols, F.col(rater_a).alias("la"), F.col(rater_b).alias("lb"))
    pair = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0))
        .cast("long").alias("agree"))
    ca = base.groupBy(*gcols, F.col("la").alias("lbl")) \
        .agg(F.count(F.lit(1)).alias("na"))
    cb = base.groupBy(*gcols, F.col("lb").alias("lbl")) \
        .agg(F.count(F.lit(1)).alias("nb"))
    join_keys = gcols + ["lbl"]
    prods = (ca.join(cb, join_keys, "inner")
             .groupBy(*gcols)
             .agg(F.sum(F.col("na") * F.col("nb")).alias("sum_prod")))
    # Disjoint label vocabularies produce NO prods row (sum_prod = 0);
    # left join + coalesce keeps the group with pe = 0.
    joined = (pair.join(prods, gcols, "left") if gcols
              else pair.crossJoin(prods))
    joined = joined.withColumn(
        "sum_prod", F.coalesce(F.col("sum_prod"), F.lit(0).cast("long")))
    num = F.col("n") * F.col("agree") - F.col("sum_prod")
    den = F.col("n") * F.col("n") - F.col("sum_prod")
    return joined.select(
        *gcols, F.col("n").cast("long").alias("n"),
        F.col("agree").cast("long").alias("agree"),
        F.col("sum_prod").cast("long").alias("sum_prod"),
        (F.col("agree").cast("double") / F.col("n")).alias("po"),
        (F.col("sum_prod").cast("double")
         / (F.col("n") * F.col("n"))).alias("pe"),
        F.when(den != 0, num.cast("double") / den).alias("kappa"))


def krippendorff_alpha(items: DataFrame, rater_a: str = "label_a",
                       rater_b: str = "label_b",
                       group_col: str | None = None) -> DataFrame:
    """Krippendorff's alpha (nominal data, two raters, no missing
    ratings) — the agreement coefficient corpus-annotation efforts
    report when raters or categories are imbalanced (kappa's known
    paradox cases).

    For this design alpha reduces to a closed form over exact bigints:
    with n items (2n ratings), S = sum_v(pooled_count_v ^ 2) and
    d = #disagreeing items,

      De_scaled = (2n)^2 - S           (expected disagreement x 2n(2n-1))
      alpha     = (De_scaled - 2*d*(2n - 1)) / De_scaled

    — ONE division of two exact bigints (NULL when De_scaled = 0, i.e.
    every rating is the same single value).  Two map-side-combinable
    aggregates (per-item disagreement + pooled value marginals), same
    scale shape as cohens_kappa."""
    gcols = [group_col] if group_col else []
    base = items.select(
        *gcols, F.col(rater_a).alias("la"), F.col(rater_b).alias("lb"))
    pair = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("la") != F.col("lb"), 1).otherwise(0))
        .cast("long").alias("disagree"))
    pooled = (base.select(*gcols, F.col("la").alias("v"))
              .unionByName(base.select(*gcols, F.col("lb").alias("v")))
              .groupBy(*gcols, "v").agg(F.count(F.lit(1)).alias("c"))
              .groupBy(*gcols).agg(F.sum(F.col("c") * F.col("c"))
                                   .alias("s")))
    joined = pair.join(pooled, gcols) if gcols else pair.crossJoin(pooled)
    two_n = F.col("n") * 2
    de = two_n * two_n - F.col("s")
    num = de - F.col("disagree") * 2 * (two_n - 1)
    return joined.select(
        *gcols, F.col("n").cast("long").alias("n"),
        F.col("disagree").cast("long").alias("disagree"),
        F.col("s").cast("long").alias("sum_sq_pooled"),
        F.when(de != 0, num.cast("double") / de).alias("alpha"))
