"""Deduplication operators for the 100 TB training-data path.

Exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band ->
bucket-join), SimHash, and n-gram Jaccard verification.  Design notes
for scale:

* Exact dedup: one shuffle on the content hash; survivor = min doc_id
  via window — no collect, no skew (hash keys are uniform).
* MinHash signatures are pure Column expressions (xxhash64 + aggregate
  over the shingle array — stays in codegen).  LSH bands explode to
  (band_idx, band_hash) and group: candidate generation is one shuffle
  whose key cardinality grows with corpus size, not pairs².
* Verification joins candidates back to shingle sets and computes exact
  Jaccard with array_intersect/array_union — native.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE = (1 << 61) - 1


def normalized_words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda w: F.length(w) > 0)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles as an array<string> (pure Columns)."""
    words = normalized_words(text)
    k = F.size(words) - (n - 1)
    return F.when(k <= 0, F.array_distinct(F.array(F.concat_ws(" ", words)))).otherwise(
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), k),
                        lambda i: F.concat_ws(" ", F.slice(words, i, n)))
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, content_hash, group_size, is_canonical).

    Survivor per hash group = lowest doc_id (deterministic); analog of
    the reference's queue-population skip of already-seen paths
    (olmocr/olmocr/work_queue.py:131-151, SURVEY O8)."""
    w = Window.partitionBy("content_hash")
    return (
        docs.select(id_col, F.md5(F.col(text_col)).alias("content_hash"))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("is_canonical", F.col(id_col) == F.min(id_col).over(w))
    )


def _minhash_sig(shingles: Column, k: int, seed: int = 7) -> Column:
    """array<bigint> of k minhash values — aggregate(min) per permutation,
    permutation i = xxhash64(shingle, seed+i), all JVM-side."""

    def _perm(i: int):
        # closure factory: PySpark infers lambda arity from the signature,
        # so the merge fn must take exactly (acc, s)
        return lambda acc, s: F.least(
            acc, F.pmod(F.xxhash64(s, F.lit(seed + i)), F.lit(MERSENNE)))

    return F.array(*[
        F.aggregate(shingles, F.lit(2 ** 62).cast("long"), _perm(i))
        for i in range(k)
    ])


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 16) -> DataFrame:
    return docs.select(
        id_col,
        word_shingles(F.col(text_col)).alias("shingles"),
    ).withColumn("sig", _minhash_sig(F.col("shingles"), k))


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 16,
                        bands: int = 4) -> DataFrame:
    """MinHash-LSH near-dup candidates -> verified n-gram Jaccard.

    -> (doc_a, doc_b, jaccard).  Pairs are emitted once (a < b)."""
    rows_per_band = k // bands
    sigs = minhash_signatures(docs, text_col, id_col, k)
    banded = sigs.select(
        id_col, "shingles",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(
                        ",", F.transform(F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                         lambda v: v.cast("string"))
                    )).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "shingles", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.%s" % id_col) < F.col("b.%s" % id_col))
        .select(
            F.col("a.%s" % id_col).alias("doc_a"),
            F.col("b.%s" % id_col).alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs.select(
        "doc_a", "doc_b",
        (F.size(F.array_intersect("sh_a", "sh_b"))
         / F.size(F.array_union("sh_a", "sh_b"))).alias("jaccard"),
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        block_col: str = "lang",
                        threshold: float = 0.0) -> DataFrame:
    """Blocked all-pairs n-gram Jaccard (the exact verifier; SQL-parity
    with the DuckDB oracle).  Blocking on ``block_col`` bounds the
    quadratic term per block."""
    base = docs.select(id_col, F.col(block_col).alias("block"),
                       word_shingles(F.col(text_col), n).alias("sh"))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, "block")
        .where(F.col("a.%s" % id_col) < F.col("b.%s" % id_col))
        .select(
            F.col("a.%s" % id_col).alias("doc_a"),
            F.col("b.%s" % id_col).alias("doc_b"),
            (F.size(F.array_intersect("a.sh", "b.sh"))
             / F.size(F.array_union("a.sh", "b.sh"))).alias("jaccard"),
        )
        .where(F.col("jaccard") > threshold)
    )


def simhash_votes(text: Column, bits: int = 64) -> Column:
    """Per-bit majority votes for SimHash, one pass over the words.

    aggregate(words) with an array<long> accumulator: each word's hash
    contributes +1/-1 per bit (bit positions are Python literals, so
    every shift amount is a constant — shiftright requires that)."""
    words = normalized_words(text)

    def _sign_bits(h: Column) -> Column:
        return F.array(*[
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1).cast("long")).otherwise(F.lit(-1).cast("long"))
            for b in range(bits)
        ])

    return F.aggregate(
        F.transform(words, lambda w: F.xxhash64(w)),
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(acc, _sign_bits(h), lambda a, v: a + v),
    )


def pack_simhash(votes: Column, bits: int = 64) -> Column:
    """votes array<long> -> packed 64-bit SimHash (sign bit via shiftleft
    wrap, staying in long range)."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(votes[b] > 0,
                           F.shiftleft(F.lit(1).cast("long"), b)
                           ).otherwise(F.lit(0).cast("long"))
    return out


def simhash_col(text: Column, bits: int = 64) -> Column:
    """Convenience single-expression SimHash.  Prefer the two-step
    (simhash_votes as a named column, then pack_simhash) in real plans —
    it keeps the vote aggregate from being duplicated per bit."""
    return pack_simhash(simhash_votes(text, bits), bits)


def simhash_near_pairs(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 8) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit prefix bands, verify by
    popcount of xor (bit_count native)."""
    sh = (
        docs.select(id_col, simhash_votes(F.col(text_col)).alias("_votes"))
        .select(id_col, pack_simhash(F.col("_votes")).alias("simhash"))
    )
    banded = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for i in range(4)
        ])).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a.%s" % id_col) < F.col("b.%s" % id_col))
        .select(F.col("a.%s" % id_col).alias("doc_a"),
                F.col("b.%s" % id_col).alias("doc_b"),
                F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= max_hamming)
    )
