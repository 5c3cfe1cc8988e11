"""Distributed n-gram language-model quality filtering (CCNet-style).

CCNet (Wenzek et al., LREC 2020) buckets Common-Crawl documents into
head/middle/tail thirds by the perplexity of a Wikipedia-trained KenLM
5-gram model — the single most load-bearing quality signal in modern
webtext curation (used by LLaMA, FineWeb ablations, the reference's
corpus lineage).  KenLM itself is a C++ single-node trainer; this
module re-expresses the idea Spark-native with a bigram **Stupid
Backoff** model (Brants et al., EMNLP 2007) — the smoothing scheme
*designed* for distributed training: no discount renormalization pass,
so training is exactly two groupBy aggregations and every score is a
plain count ratio.

Scale design:

* Training touches the corpus twice (unigram + bigram groupBy, both
  keyed on uniform word/word-pair hashes) and emits *model-sized*
  tables.  The conditional log-prob log10(c12/c1) is attached to the
  bigram table at train time via a model×model join, so scoring never
  re-joins per-token against unigram counts.
* ``min_count`` prunes the bigram table (classic count cutoff) —
  at 100 TB the pruned model is vocab²-bounded in theory but
  Zipf-small in practice; AQE broadcasts it under the threshold and
  shuffle-joins above it, both correct.
* Scoring explodes the corpus to (doc_id, w1, w2) token rows once,
  left-joins the bigram model, and backoff-joins only the missed rows'
  w2 against the unigram table.  Per-doc reduction is one sum/count
  agg; perplexity = 10^(-logp/N).
* Bucketing is an ntile(3) window per language over (rounded ppl,
  doc_id) — deterministic, engine-portable, and embarrassingly
  parallel across language partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_words


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per in-document word bigram."""
    words = normalized_words(F.col(text_col))
    k = F.size(words) - 1
    zipped = F.when(k > 0, F.arrays_zip(
        F.slice(words, 1, k).alias("w1"),
        F.slice(words, 2, k).alias("w2"))) \
        .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (docs.select(F.col(id_col), F.explode(zipped).alias("bg"))
            .select(id_col, F.col("bg.w1").alias("w1"),
                    F.col("bg.w2").alias("w2")))


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", alpha: float = 0.4,
                    min_count: int = 1) -> tuple[DataFrame, DataFrame]:
    """Train a Stupid-Backoff bigram LM -> (bigram_model, unigram_model).

    bigram_model:  (w1, w2, logp)     logp = log10(c12 / c1)
    unigram_model: (w, logp_bo)       logp_bo = log10(alpha * c / total)

    Both tables carry log-probs, not counts, so scoring is pure joins.
    """
    uni = (docs.select(F.explode(normalized_words(F.col(text_col)))
                       .alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    total = uni.agg(F.sum("c").alias("_total"))
    unigram_model = (uni.crossJoin(F.broadcast(total))
                     .select("w",
                             F.log10(F.lit(alpha) * F.col("c")
                                     / F.col("_total")).alias("logp_bo"),
                             "c"))
    bi = (_doc_bigrams(docs, text_col, id_col)
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
          .where(F.col("c12") >= min_count))
    bigram_model = (bi.join(uni.select(F.col("w").alias("w1"),
                                       F.col("c").alias("c1")), "w1")
                    .select("w1", "w2",
                            F.log10(F.col("c12") / F.col("c1"))
                            .alias("logp")))
    return bigram_model, unigram_model.select("w", "logp_bo")


def lm_score(docs: DataFrame, bigram_model: DataFrame,
             unigram_model: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document perplexity under the trained model ->
    (id, n_bigrams, ppl).  Docs with < 2 words get ppl NULL (no
    bigram evidence — callers route them to the 'na' bucket).  OOV
    backoff words count as frequency 1 (logp_bo floor comes from the
    unigram join miss)."""
    tok = _doc_bigrams(docs, text_col, id_col)
    scored = (tok
              .join(bigram_model, ["w1", "w2"], "left")
              .join(unigram_model.withColumnRenamed("w", "w2"),
                    "w2", "left")
              .select(id_col,
                      F.coalesce("logp", "logp_bo",
                                 F.lit(-12.0)).alias("lp")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.sum("lp").alias("lp_sum"),
                    F.count(F.lit(1)).alias("n_bigrams")))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.when(F.col("n_bigrams") > 0,
                           F.pow(F.lit(10.0),
                                 -F.col("lp_sum") / F.col("n_bigrams")))
                    .alias("ppl")))


def ppl_buckets(scored: DataFrame, part_col: str = "lang",
                id_col: str = "doc_id") -> DataFrame:
    """CCNet head/middle/tail assignment: ntile(3) per ``part_col``
    over ascending perplexity (lower ppl = closer to the model = head).
    Ordering ties break on (rounded ppl, id) so the split is
    deterministic and engine-portable.  NULL-ppl docs are excluded
    from the tiles (they'd skew the thirds) and come back as 'na'."""
    nn = scored.where(F.col("ppl").isNotNull())
    w = Window.partitionBy(part_col).orderBy(
        F.round("ppl", 6).asc(), F.col(id_col))
    tile = F.ntile(3).over(w)
    bucket = (F.when(tile == 1, F.lit("head"))
              .when(tile == 2, F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (nn.withColumn("bucket", bucket)
            .unionByName(scored.where(F.col("ppl").isNull())
                         .withColumn("bucket", F.lit("na"))))


def train_kn_bigram(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    discount: float = 0.75
                    ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Interpolated Kneser-Ney bigram model (Kneser & Ney 1995; Chen &
    Goodman's empirical study 1999) -> (bigram_model, backoff_model,
    cont_model).

    Where Stupid Backoff (``train_bigram_lm``) is the cheap
    score-shaped heuristic, KN is the reference smoothing for n-gram
    LMs — and its signature quantity, the *continuation probability*
    P_cont(w) = N1+(. w) / N1+(. .), is purely relational: a distinct
    count over the bigram TYPE table.  Everything here is groupBys
    over that table:

    * bigram_model (w1, w2, p):
      p = max(c12 - D, 0)/c(w1) + (D * N1+(w1 .)/c(w1)) * P_cont(w2)
    * backoff_model (w1, lam):   lam = D * N1+(w1 .) / c(w1)
      — the probability mass the discount reserved for unseen
      continuations of w1.
    * cont_model (w2, pcont):    the zero-gram fallback.

    Scale shape: one corpus-wide bigram groupBy (the only pass over
    the data), then model-sized groupBys/joins; the bigram-type count
    is a 1-row broadcast.  Unlike Katz/Good-Turing there is no
    count-of-counts renormalization loop — the reason KN (like Stupid
    Backoff) is the smoothing that distributes.
    """
    d = float(discount)
    c12 = (_doc_bigrams(docs, text_col, id_col)
           .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")))
    ctx = (c12.groupBy("w1")
           .agg(F.sum("c12").alias("c1"),
                F.count(F.lit(1)).alias("n_fwd")))     # N1+(w1 .)
    n_rev = (c12.groupBy("w2")
             .agg(F.count(F.lit(1)).alias("n_rev")))   # N1+(. w2)
    n_types = c12.agg(F.count(F.lit(1)).alias("_nt"))  # N1+(. .)
    cont_model = (n_rev.crossJoin(F.broadcast(n_types))
                  .select("w2",
                          (F.col("n_rev").cast("double")
                           / F.col("_nt").cast("double")).alias("pcont")))
    backoff_model = ctx.select(
        "w1",
        ((F.lit(d) * F.col("n_fwd").cast("double"))
         / F.col("c1").cast("double")).alias("lam"))
    bigram_model = (c12.join(ctx, "w1").join(cont_model, "w2")
                    .select(
                        "w1", "w2",
                        (F.greatest(F.col("c12") - F.lit(d), F.lit(0.0))
                         / F.col("c1").cast("double")
                         + ((F.lit(d) * F.col("n_fwd").cast("double"))
                            / F.col("c1").cast("double"))
                         * F.col("pcont")).alias("p")))
    return bigram_model, backoff_model, cont_model


def kn_score(docs: DataFrame, bigram_model: DataFrame,
             backoff_model: DataFrame, cont_model: DataFrame,
             text_col: str = "text", id_col: str = "doc_id",
             floor: float = 1e-12) -> DataFrame:
    """Per-document Kneser-Ney perplexity -> (id, n_bigrams, kn_ppl).

    Backoff ladder, all deterministic joins: seen bigram -> model p;
    seen w1 only -> lam(w1) * pcont(w2); unseen w1 -> pcont(w2);
    w2 never seen as a continuation -> ``floor``.  Docs with < 2
    words get NULL ppl (no bigram evidence), mirroring lm_score."""
    tok = _doc_bigrams(docs, text_col, id_col)
    scored = (tok
              .join(bigram_model, ["w1", "w2"], "left")
              .join(backoff_model, "w1", "left")
              .join(cont_model, "w2", "left")
              .select(id_col,
                      F.log10(F.coalesce(
                          F.col("p"),
                          F.col("lam") * F.col("pcont"),
                          F.col("pcont"),
                          F.lit(floor))).alias("lp")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.sum("lp").alias("lp_sum"),
                    F.count(F.lit(1)).alias("n_bigrams")))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.when(F.col("n_bigrams") > 0,
                           F.pow(F.lit(10.0),
                                 -F.col("lp_sum") / F.col("n_bigrams")))
                    .alias("kn_ppl")))
