"""Similarity search over embedding columns (task brief §extras).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random hyperplane / SRP) variant as the scale path.  Dot products are
``zip_with`` + ``aggregate`` Column expressions — no Python in the inner
loop; the broadcast of the (small) query set keeps the big side
shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    -> (query_id, neighbor_id, cosine, rank).  ``queries`` is broadcast;
    the corpus side never shuffles until the final per-query top-k
    (k rows per query survive the map side thanks to the window over a
    broadcast-joined, partition-local sort at AQE's discretion)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = (
        embeddings.alias("c")
        .join(F.broadcast(q), F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_sim(F.col("qvec"), F.col(vec_col)).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id (one bit per hyperplane)."""
    bits = [
        F.when(F.aggregate(F.zip_with(vec, F.array(*[F.lit(x) for x in p]),
                                      lambda a, b: a * b),
                           F.lit(0.0), lambda acc, v: acc + v) >= 0, 1).otherwise(0)
        for p in planes
    ]
    out = F.lit(0)
    for b in bits:
        out = F.shiftleft(out.cast("long"), 1) + b
    return out.cast("long")


def deterministic_planes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes (hash-based, no RNG state)."""
    import math
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = (seed * 1_000_003 + p * 10_007 + d * 97) % 2_147_483_647
            row.append(math.sin(h))  # deterministic, roughly uniform sign
        planes.append(row)
    return planes


def knn_lsh(embeddings: DataFrame, queries: DataFrame, dim: int, k: int = 5,
            n_planes: int = 6, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: SRP bucket join then exact cosine within bucket.

    At 10^12 scale the bucket key bounds the join fan-out; recall is
    tuned by n_planes (fewer planes -> bigger buckets -> higher recall)."""
    planes = deterministic_planes(dim, n_planes)
    c = embeddings.withColumn("bucket", srp_signature(F.col(vec_col), planes))
    q = (queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
         .withColumn("bucket", srp_signature(F.col("qvec"), planes)))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                cosine_sim(F.col("qvec"), F.col(vec_col)).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def label_centroids(embeddings: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Mean embedding per label via posexplode + two-level groupBy —
    the shuffle key is (label, dim position), fully parallel in dim."""
    return (
        embeddings.select(label_col, F.posexplode(vec_col).alias("pos", "v"))
        .groupBy(label_col, "pos")
        .agg(F.avg("v").alias("mean_v"), F.count(F.lit(1)).alias("n"))
        .groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_v"))).alias("pairs"),
             F.first("n").alias("n_vectors"))
        .select(label_col, F.transform("pairs", lambda s: s["mean_v"]).alias("centroid"),
                "n_vectors")
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        label_col: str = "label") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label."""
    base = embeddings.select(F.col(id_col), F.col(label_col).alias("blk"), F.col(vec_col).alias("v"))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, "blk")
        .where(F.col("a.%s" % id_col) < F.col("b.%s" % id_col))
        .select(F.col("a.%s" % id_col).alias("vec_a"),
                F.col("b.%s" % id_col).alias("vec_b"),
                cosine_sim(F.col("a.v"), F.col("b.v")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
