"""Bounded-memory frequency / cardinality sketches (KMV, Count-Min).

At 100 TB the two quantities a curation pipeline asks for constantly —
"how many distinct X per group" and "how often does term Y occur" —
cannot be answered with exact hash tables per group: per-host vocab
alone is billions of cells.  The two classic fixed-size answers are

* **KMV / bottom-k** (Bar-Yossef et al. 2002; Beyer et al. SIGMOD
  2007): keep the k smallest hash values of the distinct elements;
  the k-th smallest, viewed as a fraction of the hash space, estimates
  distinct count as ``(k-1) / u_(k)``.  Mergeable (union = merge the
  bottom-k sets), so it composes with Spark's partial aggregation.
* **Count-Min** (Cormode & Muthukrishnan 2005): a depth x width grid
  of counters; each term increments one counter per row (chosen by an
  independent hash); a point estimate is the min over rows — always an
  over-estimate, biased by hash collisions, with the classic
  (eps, delta) = (e/width, e^-depth) guarantee.

Both are implemented with the md5-derived 60-bit hash the DuckDB
oracle can replay bit-for-bit (``dedup.md5_hash64``), so the *entire
estimator* — not just the exact side — sits under the value gate.
Production would swap ``hash_fn=F.xxhash64``-based variants; the knob
exists on every function.

Scale shape:

* ``kmv_distinct``: one distinct on (key, value), one rank window per
  key (streaming — no per-key array is ever materialized), one
  group agg.  Output is |keys| rows regardless of cardinality.
* ``cms_build``: explode x depth rows, ONE groupBy on (row, bucket)
  with map-side partial combine; the sketch is depth*width cells no
  matter the vocabulary.  ``cms_probe`` is a broadcast-sized join of
  the probe terms against the sketch.

Relation to the reference: olmocr's dedup/scale work keeps per-key
seen-sets in memory on one node; these sketches are the distributed
fixed-memory replacements (cited pattern, not code:
olmocr/olmocr/work_queue.py's seen-work tracking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_hash64

_HASH_SPACE = float(2 ** 60)    # md5_hash64 is a 60-bit hash


def kmv_distinct(df: DataFrame, key_col: str, value_col: str,
                 k: int = 64, hash_fn=md5_hash64,
                 with_exact: bool = True) -> DataFrame:
    """Per-key KMV distinct-count estimate -> (key, n_kept,
    est_distinct, exact_distinct?).

    ``est_distinct = (k-1) / (h_(k) / 2^60)`` when the key has >= k
    distinct values, else the exact count of kept values (the sketch
    is lossless below its capacity).  ``with_exact`` attaches the
    exact distinct count as an audit column (kept at gate scale,
    dropped at 100 TB — that count is what the sketch replaces).
    """
    d = (df.select(F.col(key_col).alias("key"),
                   F.col(value_col).alias("value"))
         .where(F.col("value").isNotNull())
         .distinct())
    h = d.select("key", hash_fn(F.col("value")).alias("h"))
    w = Window.partitionBy("key").orderBy("h")
    topk = (h.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k))
    scale = float(k - 1) * _HASH_SPACE
    agg = (topk.groupBy("key")
           .agg(F.count(F.lit(1)).alias("n_kept"),
                F.max(F.when(F.col("rn") == k, F.col("h"))).alias("_kth"))
           .select("key", "n_kept",
                   F.when(F.col("_kth").isNotNull(),
                          F.round(F.lit(scale)
                                  / F.col("_kth").cast("double"), 6))
                   .otherwise(F.col("n_kept").cast("double"))
                   .alias("est_distinct")))
    if not with_exact:
        return agg
    exact = d.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    return agg.join(exact, "key")


def _cms_bucket(term: Column, row: int, width: int, hash_fn) -> Column:
    """Row-i bucket: an independent hash via a per-row salt suffix."""
    return F.pmod(hash_fn(F.concat(term, F.lit(f"#cms{row}"))),
                  F.lit(width)).cast("int")


def cms_build(terms: DataFrame, term_col: str = "term",
              weight_col: str | None = None,
              depth: int = 4, width: int = 1024,
              hash_fn=md5_hash64) -> DataFrame:
    """Count-Min sketch of a term stream -> (row, bucket, c).

    One exploded pass (depth cells per input row) into ONE groupBy on
    (row, bucket) — partial aggregation collapses it map-side, so the
    shuffle carries at most depth*width rows per map task regardless
    of input size.  ``weight_col`` supports weighted counts (e.g.
    pre-aggregated term frequencies) — the sketch of an aggregated
    stream equals the sketch of the raw stream.
    """
    t = F.col(term_col)
    wcol = (F.col(weight_col).cast("long") if weight_col
            else F.lit(1).cast("long"))
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 _cms_bucket(t, i, width, hash_fn).alias("bucket"))
        for i in range(depth)])
    return (terms.select(F.explode(cells).alias("cell"), wcol.alias("w"))
            .groupBy(F.col("cell.row").alias("row"),
                     F.col("cell.bucket").alias("bucket"))
            .agg(F.sum("w").alias("c")))


def cms_probe(cms: DataFrame, probes: DataFrame, term_col: str = "term",
              depth: int = 4, width: int = 1024,
              hash_fn=md5_hash64) -> DataFrame:
    """Point-estimate probe terms against a sketch -> probes +
    (cms_est).  est = min over rows of the term's counter (0 when a
    row's bucket is empty — only possible when the sketch saw no
    colliding term).  The probe side is join-broadcast-sized by
    construction (a report's worth of terms)."""
    t = F.col(term_col)
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 _cms_bucket(t, i, width, hash_fn).alias("bucket"))
        for i in range(depth)])
    exploded = (probes.select(term_col, F.explode(cells).alias("cell"))
                .select(term_col, F.col("cell.row").alias("row"),
                        F.col("cell.bucket").alias("bucket")))
    est = (exploded.join(cms, ["row", "bucket"], "left")
           .groupBy(term_col)
           .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long")))
                .alias("cms_est")))
    return probes.join(est, term_col)


def _rank_quantile(q: float) -> Column:
    """Aggregate expression: the value at rank ceil(q * n) under
    (value, id) ordering — the interpolation-free order statistic that
    replays identically in any engine.  Expects columns rn (1-based
    row_number per key) and n (group size) on the grouped frame."""
    return F.max(F.when(
        F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
        F.col("val")))


def sampled_quantiles(df: DataFrame, key_col: str, value_col: str,
                      id_col: str, rate: int = 4,
                      qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                      hash_fn=md5_hash64,
                      with_exact: bool = True) -> DataFrame:
    """Per-key quantile estimates from a deterministic 1/rate hash
    sample -> (key, n_rows, n_sampled, est_p*, exact_p*?).

    The fixed-fraction cousin of KMV: keep rows whose md5-derived
    60-bit id-hash is 0 mod ``rate`` (deterministic, so the sample of
    a union is the union of samples — mergeable across partitions and
    snapshots), then read order statistics off the sample.  Quantile
    definition is the interpolation-free rank statistic ``value at
    row_number ceil(q*n)`` under (value, id) ordering, so both engines
    produce the exact same value — no percentile-interpolation
    semantics anywhere (the zipf_stats precedent).

    Scale shape: the full corpus contributes one filter + one count
    agg; only the 1/rate sample is sorted (per-key streaming rank
    window, no arrays).  ``with_exact`` attaches the same rank
    statistic over ALL rows as the audit column pair — gate-scale
    only; at 10^12 docs the exact side is what the sample replaces.
    Production swaps hash_fn=xxhash64 and rate ~ 10^4.
    """
    keyed = df.select(F.col(key_col).alias("key"),
                      F.col(value_col).cast("long").alias("val"),
                      F.col(id_col).alias("_id"))
    totals = keyed.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"))

    def order_stats(rows: DataFrame, prefix: str) -> DataFrame:
        w = Window.partitionBy("key").orderBy("val", "_id")
        n = Window.partitionBy("key")
        ranked = (rows.withColumn("rn", F.row_number().over(w))
                  .withColumn("n", F.count(F.lit(1)).over(n)))
        aggs = [F.max("n").cast("long").alias(f"{prefix}_n")] + [
            _rank_quantile(q)
            .alias(f"{prefix}_p{int(round(q * 100))}") for q in qs]
        return ranked.groupBy("key").agg(*aggs)

    sample = keyed.where(
        F.pmod(hash_fn(F.concat(F.lit("qsk:"),
                                F.col("_id").cast("string"))),
               F.lit(rate)) == 0)
    est = (order_stats(sample, "est")
           .withColumnRenamed("est_n", "n_sampled"))
    out = totals.join(est, "key", "left")
    if with_exact:
        out = out.join(order_stats(keyed, "exact")
                       .drop("exact_n"), "key", "left")
    return out


def skew_stats(rows: DataFrame, key_col: str) -> DataFrame:
    """Shuffle-key skew diagnostics -> ONE row: (n_keys, n_rows,
    max_count, max_key, mean_count, gini, salt_factor) — the
    pre-flight check a 100 TB job runs on its join/groupBy key before
    committing to a partitioning (VERDICT-grade skew handling starts
    with measuring it, not guessing).

    * ``gini`` of the per-key count distribution from the sorted-rank
      identity G = (2*sum(i*c_i) - (n+1)*sum(c)) / (n*sum(c)) with
      c_1 <= ... <= c_n — every term bigint, ONE final division, so
      the number replays bit-for-bit in any engine.  0 = perfectly
      uniform keys, -> 1 = one viral key owns the corpus.
    * ``salt_factor`` = ceil(max_count * n_keys / n_rows) — how many
      salt buckets bring the hottest key down to the MEAN key load
      (1 = no salting needed); exact integer ceil via div arithmetic.

    Cost: one groupBy on the key (the same shuffle the real job would
    do), one sorted |keys|-row window, one 1-row agg."""
    from pyspark.sql import Window

    counts = (rows.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("c")))
    w = Window.orderBy("c", "key")
    ranked = counts.select("key", "c",
                           F.row_number().over(w).cast("long").alias("i"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_count"),
        F.max(F.struct(F.col("c"), F.col("key"))).alias("_mx"),
        F.sum(F.col("i") * F.col("c")).cast("long").alias("_ic"))
    n, tot = F.col("n_keys"), F.col("n_rows")
    gini = (F.lit(2) * F.col("_ic") - (n + 1) * tot).cast("double") \
        / (n * tot).cast("double")
    salt = F.expr("(max_count * n_keys + n_rows - 1) div n_rows")
    return agg.select(
        "n_keys", "n_rows", "max_count",
        F.col("_mx.key").alias("max_key"),
        F.round(tot.cast("double") / n.cast("double"), 6)
        .alias("mean_count"),
        F.round(gini, 6).alias("gini"),
        salt.cast("long").alias("salt_factor"))


def robust_stats(rows: DataFrame, key_col: str, value_col: str,
                 trim: float = 0.1) -> DataFrame:
    """Outlier-resistant per-key statistics -> (key, n, median, mad,
    trimmed_mean, mean): the doc-length / quality-score health row a
    corpus report shows next to the plain mean, which one viral page
    can drag arbitrarily.

    Engine-exact: median and MAD are the interpolation-free
    value-at-ceil(n/2) order statistic under (value, rank) ordering
    (both medians are corpus VALUES, so bigint until the final MAD
    subtraction); the trimmed mean sums the bigint values whose rank
    lies in (ceil(trim*n), n - ceil(trim*n)] and divides ONCE.  Two
    rank windows per key + one agg — the same two-exchange plan at any
    corpus size."""
    from pyspark.sql import Window

    v = rows.select(F.col(key_col).alias("key"),
                    F.col(value_col).cast("long").alias("val"))
    w = Window.partitionBy("key").orderBy("val")
    n_w = Window.partitionBy("key")
    r = v.select("key", "val",
                 F.row_number().over(w).cast("long").alias("i"),
                 F.count(F.lit(1)).over(n_w).cast("long").alias("n"))
    med_rank = F.ceil(F.col("n").cast("double") / 2.0).cast("long")
    med = (r.where(F.col("i") == med_rank)
           .select("key", F.col("val").alias("median")))
    # MAD: same order statistic over |val - median|
    dev = (v.join(med, "key")
           .select("key", F.abs(F.col("val") - F.col("median"))
                   .alias("dv")))
    wd = Window.partitionBy("key").orderBy("dv")
    rd = dev.select("key", "dv",
                    F.row_number().over(wd).cast("long").alias("i"),
                    F.count(F.lit(1)).over(n_w).cast("long").alias("n"))
    mad = (rd.where(F.col("i") == F.ceil(F.col("n").cast("double") / 2.0)
                    .cast("long"))
           .select("key", F.col("dv").alias("mad")))
    cut = F.ceil(F.lit(float(trim)) * F.col("n").cast("double")) \
        .cast("long")
    agg = (r.groupBy("key")
           .agg(F.max("n").alias("n"),
                F.sum("val").alias("_s"),
                F.sum(F.when((F.col("i") > cut) & (F.col("i") <= F.col("n")
                                                   - cut), F.col("val"))
                      .otherwise(F.lit(0))).cast("long").alias("_ts"),
                F.sum(F.when((F.col("i") > cut) & (F.col("i") <= F.col("n")
                                                   - cut), 1)
                      .otherwise(0)).cast("long").alias("_tn")))
    return (agg.join(med, "key").join(mad, "key")
            .select(F.col("key").alias(key_col), "n", "median", "mad",
                    F.round(F.when(F.col("_tn") > 0,
                                   F.col("_ts").cast("double")
                                   / F.col("_tn").cast("double"))
                            .otherwise(F.lit(0.0)), 6)
                    .alias("trimmed_mean"),
                    F.round(F.col("_s").cast("double")
                            / F.col("n").cast("double"), 6)
                    .alias("mean")))


def zorder_key(a: "F.Column", b: "F.Column", bits: int = 16) -> "F.Column":
    """Z-order (Morton) interleave of two non-negative ints quantized
    to [0, 2^bits) -> one bigint sort key: writing files sorted by it
    clusters rows that are close in BOTH dimensions, so parquet
    min/max stats prune scans filtered on EITHER dimension — the
    standard multi-dimension layout trick (Delta/Iceberg OPTIMIZE
    ZORDER) for corpus tables queried by (host, time) or
    (length, quality).

    a's bit i lands at position 2i+1, b's at 2i (a = major).  Pure
    bit arithmetic unrolled over Python-literal positions — 2*bits
    shift/mask/or terms, comfortably inside whole-stage codegen (the
    flat-unroll regime; see the PQ fold note for where unrolling
    stops winning)."""
    a = a.cast("long")
    b = b.cast("long")
    out = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for i in range(bits):
        # Column & / | are LOGICAL operators in PySpark — bit math
        # needs the explicit bitwiseAND/bitwiseOR methods
        out = (out
               .bitwiseOR(F.shiftleft(
                   F.shiftright(a, i).bitwiseAND(one), 2 * i + 1))
               .bitwiseOR(F.shiftleft(
                   F.shiftright(b, i).bitwiseAND(one), 2 * i)))
    return out


def metric_corr(docs: DataFrame, x_col: str, y_col: str,
                part_col: str = "source") -> DataFrame:
    """Pearson correlation between two INTEGER per-doc metrics, per
    partition — the co-movement check corpus reports run (does length
    track token count? does quality track perplexity?) with the
    assortativity discipline: five exact bigint co-moments folded
    through ONE closed-form double expression, so the result is
    bit-identical across engines where a streaming corr() would not
    be.  NULL when either variance is zero."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = (docs.groupBy(F.col(part_col).alias("part"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(x).alias("sx"), F.sum(y).alias("sy"),
                F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
                F.sum(x * y).alias("sxy")))
    n = F.col("n")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when((vx > 0) & (vy > 0),
               cov.cast("double")
               / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))))
    return agg.select(F.col("part").alias(part_col),
                      n.cast("long").alias("n"), r.alias("pearson_r"))
