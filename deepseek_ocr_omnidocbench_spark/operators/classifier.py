"""Hashed linear text classifier (DCLM / FineWeb-Edu style filtering).

Modern curation pipelines gate documents with a cheap linear
classifier over hashed bag-of-ngram features — fastText's model shape
(Joulin et al. 2017), used by DCLM's quality filter and FineWeb-Edu's
educational-value scorer.  This module provides the Spark-native
version of both halves:

* **Featurize**: words + word-bigrams -> hashing-trick buckets
  (``hash(term) mod dim``), value = term_count / n_terms ("mean bag").
  Pure Column ops: one explode + groupBy keyed on (doc, bucket).
* **Apply**: score = sigmoid(sum_b w[b] * x[b]) — a join of the
  feature rows against a model-sized weight table (broadcast at any
  realistic dim) and a per-doc sum.  This is the 100 TB read path:
  one corpus scan, one broadcast join, one agg.
* **Train**: full-batch logistic regression by gradient descent,
  expressed as iterative DataFrame aggregations — each epoch is one
  join (margin), one per-doc sigmoid, and one groupBy-sum gradient
  keyed on bucket.  Weights live in a DataFrame (never densified on
  the driver); lineage is truncated per epoch.  For the sandbox this
  verifies against a dense numpy reference bit-for-bit-close; at
  scale the same loop is mini-batchable by sampling doc partitions.

``hash_fn`` defaults to xxhash64 (production); pass ``md5_hash64``
for the engine-portable variant the DuckDB oracle and the numpy
parity tests replicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash64, normalized_words


def _terms(text: Column) -> Column:
    """words + space-joined word bigrams, as one array<string>."""
    words = normalized_words(text)
    k = F.size(words) - 1
    bigrams = F.when(k > 0, F.transform(
        F.arrays_zip(F.slice(words, 1, k), F.slice(words, 2, k)),
        lambda s: F.concat_ws(" ", s["0"], s["1"]))) \
        .otherwise(F.array().cast("array<string>"))
    return F.concat(words, bigrams)


def hashed_features(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", dim: int = 1 << 18,
                    hash_fn=None) -> DataFrame:
    """-> (id, bucket, value): hashing-trick mean-bag features.
    ``bucket`` in [0, dim); value = count(term)/n_terms.  Collisions
    are part of the contract (that's the hashing trick)."""
    h = hash_fn or F.xxhash64
    t = (docs.select(F.col(id_col), F.explode(_terms(F.col(text_col)))
                     .alias("term"))
         .select(id_col, F.pmod(h(F.col("term")), F.lit(dim))
                 .alias("bucket")))
    n = t.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    return (t.groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("_c"))
            .join(n, id_col)
            .select(id_col, "bucket",
                    (F.col("_c") / F.col("_n")).alias("value")))


def apply_linear(features: DataFrame, weights: DataFrame,
                 id_col: str = "doc_id") -> DataFrame:
    """-> (id, score): sigmoid of the sparse dot product.  ``weights``
    is (bucket, weight); missing buckets contribute 0.  The weight
    table is model-sized -> broadcast."""
    margin = (features.join(F.broadcast(weights), "bucket")
              .groupBy(id_col)
              .agg(F.sum(F.col("value") * F.col("weight")).alias("z")))
    return (features.select(id_col).distinct()
            .join(margin, id_col, "left")
            .select(id_col,
                    (F.lit(1.0) /
                     (F.lit(1.0) + F.exp(-F.coalesce("z", F.lit(0.0)))))
                    .alias("score")))


def train_logreg(features: DataFrame, labels: DataFrame,
                 id_col: str = "doc_id", label_col: str = "label",
                 iters: int = 10, lr: float = 1.0) -> DataFrame:
    """Full-batch logistic regression -> (bucket, weight).

    Gradient of mean log-loss: g[b] = mean_i (sigmoid(z_i) - y_i) *
    x_i[b].  Each epoch: one feature×weight join for margins, one
    per-doc agg, one feature×error join for the gradient, one groupBy
    on bucket.  All shuffles key on doc or bucket (uniform)."""
    n_docs = labels.count()
    feats = features.localCheckpoint(eager=True)
    y = labels.select(id_col, F.col(label_col).cast("double").alias("y"))
    weights = feats.select("bucket").distinct() \
        .select("bucket", F.lit(0.0).alias("weight")) \
        .localCheckpoint(eager=True)
    for _ in range(iters):
        margin = (feats.join(weights, "bucket")
                  .groupBy(id_col)
                  .agg(F.sum(F.col("value") * F.col("weight")).alias("z")))
        err = (y.join(margin, id_col, "left")
               .select(id_col,
                       (F.lit(1.0) / (F.lit(1.0)
                                      + F.exp(-F.coalesce("z", F.lit(0.0))))
                        - F.col("y")).alias("e")))
        grad = (feats.join(err, id_col)
                .groupBy("bucket")
                .agg((F.sum(F.col("value") * F.col("e")) / n_docs)
                     .alias("g")))
        weights = (weights.join(grad, "bucket", "left")
                   .select("bucket",
                           (F.col("weight")
                            - lr * F.coalesce("g", F.lit(0.0)))
                           .alias("weight"))
                   .localCheckpoint(eager=True))
    return weights


def deterministic_weights(dim: int, spark) -> DataFrame:
    """A fixed pseudo-random weight table derived from md5(bucket) —
    the engine-portable stand-in for an offline-trained model, so the
    APPLY path sits under the DuckDB value-parity gate."""
    return (spark.range(dim).select(F.col("id").cast("long").alias("bucket"))
            .select("bucket",
                    ((md5_hash64(F.concat(F.lit("w,"),
                                          F.col("bucket").cast("string")))
                      % 1000001) / F.lit(1000000.0) - F.lit(0.5))
                    .alias("weight")))
