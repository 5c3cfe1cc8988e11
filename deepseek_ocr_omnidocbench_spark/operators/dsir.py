"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169), Spark-native.

DSIR selects pretraining documents whose hashed-n-gram distribution
looks like a trusted *target* corpus (Wikipedia/books in the paper):

1. featurize every document into hashed unigram+bigram buckets,
2. fit two bag-of-buckets models — target vs raw — with add-one
   smoothing,
3. per-document importance log-weight
   ``log w(x) = sum_b cnt_b(x) * (log p_target[b] - log p_raw[b])``,
4. sample k documents WITHOUT replacement via the Gumbel-top-k trick
   (Vieira 2014): draw ``key = log w + Gumbel(0,1)`` and take the top k
   keys — equivalent to importance resampling without replacement.

Scale shape (the whole point of hashing the n-grams):

* featurization is one explode + one (doc, bucket) groupBy — the only
  corpus-sized shuffle;
* both models are <= n_buckets rows regardless of corpus size, so the
  weight join is a broadcast;
* the Gumbel keys make selection a stateless per-row expression (the
  "randomness" is a hash of doc_id, so resampling is deterministic,
  reproducible, and needs no driver-side RNG state); top-k is Spark's
  TakeOrdered — per-partition heads, never a global sort.

No counterpart in the reference repo (its corpus lineage predates
DSIR); included as a first-class training-data curation operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash64, normalized_words


def xxhash_bucket(col: Column, n_buckets: int) -> Column:
    """Production bucket hash (JVM xxhash64, sign-folded)."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("long")


def md5_bucket(col: Column, n_buckets: int) -> Column:
    """Oracle twin: DuckDB computes the identical bucket via
    ``('0x' || substr(md5(f),1,15))::bigint % n``."""
    return F.pmod(md5_hash64(col), F.lit(n_buckets)).cast("long")


def _doc_features(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, feat) — one row per unigram and per space-joined bigram."""
    words = normalized_words(F.col(text_col))
    k = F.size(words) - 1
    bigrams = F.when(k > 0, F.zip_with(
        F.slice(words, 1, k), F.slice(words, 2, k),
        lambda a, b: F.concat(a, F.lit(" "), b))) \
        .otherwise(F.array().cast("array<string>"))
    return (docs.select(F.col(id_col),
                        F.explode(F.concat(words, bigrams)).alias("feat")))


def hashed_feature_counts(docs: DataFrame, n_buckets: int = 4096,
                          text_col: str = "text", id_col: str = "doc_id",
                          bucket_fn=xxhash_bucket) -> DataFrame:
    """(id, bucket, cnt) hashed n-gram counts per document."""
    return (_doc_features(docs, text_col, id_col)
            .select(id_col, bucket_fn(F.col("feat"), n_buckets).alias("bucket"))
            .groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("cnt")))


def bucket_model(docs: DataFrame, n_buckets: int = 4096,
                 text_col: str = "text", id_col: str = "doc_id",
                 bucket_fn=xxhash_bucket) -> DataFrame:
    """Add-one-smoothed bag-of-buckets model -> (bucket, logp).

    Only observed buckets get rows; unseen buckets implicitly score the
    smoothing floor ``log10(1 / (total + n_buckets))`` — callers pull
    the floor from the model via ``model_floor`` (one scalar collect,
    same footprint as a centroid literal)."""
    counts = (_doc_features(docs, text_col, id_col)
              .select(bucket_fn(F.col("feat"), n_buckets).alias("bucket"))
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("c")))
    total = counts.agg(F.sum("c").alias("_t"))
    return (counts.crossJoin(F.broadcast(total))
            .select("bucket",
                    F.log10((F.col("c") + 1)
                            / (F.col("_t") + F.lit(float(n_buckets))))
                    .alias("logp"),
                    F.col("_t").alias("_total")))


def model_floor(model: DataFrame, n_buckets: int) -> float:
    """Smoothing floor log-prob of a bucket the model never saw."""
    import math
    t = model.select("_total").limit(1).collect()
    total = int(t[0]["_total"]) if t else 0
    return math.log10(1.0 / (total + float(n_buckets)))


def dsir_log_weights(docs: DataFrame, target: DataFrame,
                     n_buckets: int = 4096, text_col: str = "text",
                     id_col: str = "doc_id",
                     bucket_fn=xxhash_bucket) -> DataFrame:
    """Per-document DSIR importance log-weight -> (id, n_feats, logw).

    ``target`` is the trusted-distribution sample (e.g. the corpus
    filtered to a curated subset); ``docs`` doubles as the raw model's
    training set, so raw-model lookups never miss.  Documents with no
    features (empty text) get logw = 0 (weightless, never upsampled)."""
    tm = bucket_model(target, n_buckets, text_col, id_col, bucket_fn)
    rm = bucket_model(docs, n_buckets, text_col, id_col, bucket_fn)
    t_floor = model_floor(tm, n_buckets)
    dc = hashed_feature_counts(docs, n_buckets, text_col, id_col, bucket_fn)
    per_bucket = (
        dc.join(F.broadcast(tm.select("bucket",
                                      F.col("logp").alias("lp_t"))),
                "bucket", "left")
        .join(F.broadcast(rm.select("bucket", F.col("logp").alias("lp_r"))),
              "bucket")
        .select(id_col, "cnt",
                (F.coalesce("lp_t", F.lit(t_floor)) - F.col("lp_r"))
                .alias("ratio")))
    agg = (per_bucket.groupBy(id_col)
           .agg(F.sum(F.col("cnt") * F.col("ratio")).alias("logw"),
                F.sum("cnt").alias("n_feats")))
    return (docs.select(id_col).join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                    F.coalesce("logw", F.lit(0.0)).alias("logw")))


def gumbel_key(weight: Column, id_col: Column, seed: int = 7,
               hash_fn=md5_hash64) -> Column:
    """Deterministic Gumbel-perturbed key: ``w + (-ln(-ln(u)))`` with
    ``u = (hash(id || seed) + 0.5) / 2^60`` in (0, 1)."""
    h = hash_fn(F.concat(id_col.cast("string"), F.lit(":%d" % seed)))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    return weight + (-F.log(-F.log(u)))


def gumbel_topk_sample(weighted: DataFrame, k: int,
                       id_col: str = "doc_id", weight_col: str = "logw",
                       seed: int = 7, hash_fn=md5_hash64) -> DataFrame:
    """Importance-resample k docs without replacement (Gumbel-top-k):
    -> the k rows with the largest ``logw + Gumbel`` keys, with the key
    exposed as ``gkey``.  ``orderBy().limit(k)`` compiles to
    TakeOrdered — per-partition top-k heads merged on the driver, no
    global sort shuffle."""
    keyed = weighted.withColumn(
        "gkey", gumbel_key(F.col(weight_col), F.col(id_col),
                           seed=seed, hash_fn=hash_fn))
    return keyed.orderBy(F.desc("gkey"), F.asc(id_col)).limit(k)
