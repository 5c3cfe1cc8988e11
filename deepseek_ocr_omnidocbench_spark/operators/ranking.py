"""Lexical + hybrid retrieval scoring for web-corpus curation.

BM25 (Robertson/Spärck Jones probabilistic relevance, the Okapi/Lucene
formulation) and reciprocal-rank fusion (Cormack et al. 2009) — the two
standard building blocks for query-driven corpus slicing: "pull the
top-N documents about X" as a seed set for classifier training, DSIR
targets, or contamination probes.  Both are pure DataFrame ops.

Scale shape (the point, at 10^12 docs):

- ``bm25_scores`` is ZERO-shuffle per document: the only aggregation is
  one 1-row corpus-stats frame (N, total doc length, per-term document
  frequencies) broadcast back as a literal-free cross join; per-row
  term frequencies are codegen'd JVM regex counts, so scoring pipelines
  inside the scan stage.  No (doc, term) explode, no join against a
  term dimension.
- ``rrf_fuse`` adds exactly the two rank windows its inputs need (each
  partitioned by the constant query — at real scale callers partition
  by query id) and one equi-join on doc id.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# IEEE-stable across engines: tf, df, dl, N are exact integers; every
# float op below is applied in the same order by the generated oracle
# SQL (see __spark_entry__), so Spark and DuckDB produce bit-identical
# doubles before the final round.
DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _term_count(low_text: Column, term: str) -> Column:
    """Occurrences of ``term`` as a whole word in lowercased text.

    One codegen'd regex pass with ASCII lookarounds — equivalent to
    counting equal tokens of a split on non-letters for pure [a-z]+
    terms (same argument as the lang-id combined-alternation pass), and
    ~10x cheaper than an interpreted higher-order filter over a words
    array.
    """
    if not re.fullmatch(r"[a-z]+", term):
        raise ValueError("BM25 query terms must be pure [a-z]+: %r" % term)
    pat = "(?<![a-zA-Z])%s(?![a-zA-Z])" % term
    return F.size(F.regexp_extract_all(low_text, F.lit(pat), 0))


def bm25_scores(docs: DataFrame, query_terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = DEFAULT_K1, b: float = DEFAULT_B) -> DataFrame:
    """BM25 score of every document against a fixed query-term set.

    score = sum_t idf_t * tf_t*(k1+1) / (tf_t + k1*(1 - b + b*dl*N/SD))

    with idf_t = ln((N - df_t + 0.5)/(df_t + 0.5) + 1) (the Lucene
    non-negative form), dl = word count, SD = total corpus word count.
    The length norm uses dl*N/SD (== dl/avgdl) so the only float
    division happens on two exact integers — avgdl never exists as a
    rounding-order-dependent intermediate, keeping the oracle replay
    bit-identical.

    Returns (id_col, dl, tf_<term>..., score) for every document;
    score rounded to 6 for the value gate.
    """
    low = F.lower(F.col(text_col))
    dl = F.size(F.filter(F.split(low, r"[^a-zA-Z]+"),
                         lambda w: F.length(w) > 0))
    tf_cols = {t: _term_count(low, t) for t in query_terms}
    per_doc = docs.select(
        id_col, dl.alias("dl"),
        *[c.alias("tf_%s" % t) for t, c in tf_cols.items()])
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_sd"),
        *[F.sum((F.col("tf_%s" % t) > 0).cast("bigint")).alias("df_%s" % t)
          for t in query_terms])
    joined = per_doc.join(F.broadcast(stats))
    score = None
    for t in query_terms:
        tf = F.col("tf_%s" % t).cast("double")
        df = F.col("df_%s" % t).cast("double")
        n = F.col("_n").cast("double")
        idf = F.log((n - df + 0.5) / (df + 0.5) + 1.0)
        norm = (F.col("dl").cast("double") * n
                / F.col("_sd").cast("double"))
        part = idf * (tf * (k1 + 1.0)
                      / (tf + k1 * (1.0 - b + b * norm)))
        score = part if score is None else score + part
    return joined.select(
        id_col, "dl",
        *["tf_%s" % t for t in query_terms],
        F.round(score, 6).alias("score"))


def rrf_fuse(lexical: DataFrame, semantic: DataFrame, id_col: str,
             lex_score: str = "score", sem_score: str = "cosine",
             k: int = 60, top: int = 20) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic ranking:
    rrf = 1/(k + rank_lex) + 1/(k + rank_sem), descending, top-``top``.

    Ranks are dense integers (score desc, id asc tie-break), so the
    fused score is a fixed function of integers — no float-precision
    coupling between the two input scorers survives into the fusion.
    Documents missing from one side simply contribute no term from it
    (standard RRF over unioned candidate lists).
    """
    wl = Window.orderBy(F.col(lex_score).desc(), F.col(id_col).asc())
    ws = Window.orderBy(F.col(sem_score).desc(), F.col(id_col).asc())
    lr = lexical.select(id_col,
                        F.row_number().over(wl).alias("rank_lex"))
    sr = semantic.select(id_col,
                         F.row_number().over(ws).alias("rank_sem"))
    fused = (lr.join(sr, id_col, "full_outer")
             .withColumn(
                 "rrf",
                 F.round(
                     F.coalesce(1.0 / (F.lit(k) + F.col("rank_lex")),
                                F.lit(0.0))
                     + F.coalesce(1.0 / (F.lit(k) + F.col("rank_sem")),
                                  F.lit(0.0)), 6)))
    wt = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return (fused.withColumn("rank", F.row_number().over(wt))
            .where(F.col("rank") <= top)
            .select(id_col, "rank_lex", "rank_sem", "rrf", "rank"))


def passage_chunks(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", size: int = 64,
                   stride: int = 48) -> DataFrame:
    """Overlapping fixed-size passage windows -> (id, chunk_id,
    start_word, n_words, chunk): the standard retrieval-indexing prep
    (BM25 / dense indexes score passages, not 10k-word documents; the
    overlap keeps answers that straddle a boundary findable).

    Chunk count is the closed integer form ceil(max(n - size, 0) /
    stride) + 1, so starts are 1, 1+stride, ... and the last chunk may
    be short — integer math that replays exactly in SQL.  Pure
    Columns: one whitespace split, one sequence explode, one slice per
    chunk; no shuffle at all (chunking is row-local), which is the
    whole point at corpus scale — the expensive part downstream is the
    index build, never this pass."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    n_chunks = ((F.greatest(n - size, F.lit(0)) + (stride - 1))
                .cast("long") / stride).cast("long") + 1
    return (docs
            .select(F.col(id_col), words.alias("_ws"), n.alias("_n"),
                    F.explode(F.sequence(F.lit(0),
                                         (n_chunks - 1).cast("int")))
                    .alias("chunk_id"))
            .select(id_col, "chunk_id",
                    (F.col("chunk_id") * stride + 1).alias("start_word"),
                    F.least(F.lit(size),
                            F.col("_n") - F.col("chunk_id") * stride)
                    .cast("long").alias("n_words"),
                    F.array_join(
                        F.slice(F.col("_ws"),
                                (F.col("chunk_id") * stride + 1)
                                .cast("int"), size), " ").alias("chunk")))


def retrieval_eval(runs: DataFrame, qrels: DataFrame, k: int = 10,
                   query_col: str = "query_id", id_col: str = "doc_id",
                   rank_col: str = "rank",
                   rel_col: str = "rel") -> DataFrame:
    """Graded retrieval evaluation -> one row per query:
    (query, n_rel, hits, ndcg, mrr, recall, precision) — the standard
    IR scorecard (nDCG@k with the 2^rel-1 gain, MRR@k, recall@k,
    P@k) that closes the loop on the BM25 / RRF / ANN retrieval layer:
    a corpus-scale "did the index get better" job is exactly this over
    millions of (query, ranked-list) pairs.

    Engine-exact by construction: DCG folds k per-rank terms
    gain_i * w_i through ONE explicit left-associated sum expression,
    where w_i = 1/log2(i+1) are PYTHON-precomputed double literals
    (embedding the same literal in Spark and the SQL oracle removes
    the cross-engine libm-log2 last-ulp risk), and every other number
    is a bigint until a single final division.  Unjudged ranked docs
    gain 0 (standard trec_eval behavior); queries with no relevant
    docs get ndcg/mrr/recall 0.

    Scale: one join of the run table against qrels on (query, doc) —
    both keyed uniform — then a k-column pivot per query: two
    shuffles, no explode, state O(1) per query."""
    import math

    w = [1.0 / math.log2(i + 1) for i in range(1, k + 1)]
    q, d = F.col(query_col), F.col(id_col)
    rel = F.col(rel_col).cast("long")
    gain = (F.pow(F.lit(2.0), rel.cast("double")) - 1.0)

    # judged gains joined onto the run; rank limited to k
    run_k = runs.where(F.col(rank_col) <= k).select(
        q.alias("q"), d.alias("d"), F.col(rank_col).alias("r"))
    jud = qrels.where(rel > 0).select(
        q.alias("q"), d.alias("d"), rel.alias("rel"), gain.alias("g"))
    scored = run_k.join(jud.select("q", "d", "rel", "g"),
                        ["q", "d"], "left")

    def _dcg(col_rank: str, col_gain: str, src: DataFrame) -> DataFrame:
        terms = [F.max(F.when(F.col(col_rank) == i + 1,
                              F.col(col_gain) * F.lit(w[i])))
                 for i in range(k)]
        expr = F.coalesce(terms[0], F.lit(0.0))
        for t in terms[1:]:
            expr = expr + F.coalesce(t, F.lit(0.0))
        return src.groupBy("q").agg(expr.alias("_v"))

    dcg = _dcg("r", "g", scored).withColumnRenamed("_v", "dcg")
    # ideal ranking: judged docs by rel desc (doc id tie-break)
    wi = Window.partitionBy("q").orderBy(F.desc("rel"), F.asc("d"))
    ideal = jud.withColumn("ir", F.row_number().over(wi)) \
        .where(F.col("ir") <= k)
    idcg = _dcg("ir", "g", ideal).withColumnRenamed("_v", "idcg")

    per_q = (run_k.join(jud.select("q", "d", F.lit(1).alias("_hit")),
                        ["q", "d"], "left")
             .groupBy("q")
             .agg(F.sum(F.when(F.col("_hit").isNotNull(), 1)
                        .otherwise(0)).cast("long").alias("hits"),
                  F.min(F.when(F.col("_hit").isNotNull(), F.col("r")))
                  .alias("first_rel")))
    n_rel = jud.groupBy("q").agg(F.count(F.lit(1)).cast("long")
                                 .alias("n_rel"))
    base = runs.select(q.alias("q")).distinct()
    out = (base.join(per_q, "q", "left").join(n_rel, "q", "left")
           .join(dcg, "q", "left").join(idcg, "q", "left"))
    nrel = F.coalesce("n_rel", F.lit(0))
    hits = F.coalesce("hits", F.lit(0))
    # dcg is NULL (not 0) for a query with no rank-<=k rows; such a
    # query earned nothing, so coalesce before the divide
    ndcg = F.when(F.coalesce("idcg", F.lit(0.0)) > 0,
                  F.coalesce("dcg", F.lit(0.0)) / F.col("idcg")) \
        .otherwise(F.lit(0.0))
    mrr = F.when(F.col("first_rel").isNotNull(),
                 F.lit(1.0) / F.col("first_rel").cast("double")) \
        .otherwise(F.lit(0.0))
    recall = F.when(nrel > 0, hits.cast("double") / nrel.cast("double")) \
        .otherwise(F.lit(0.0))
    return out.select(
        F.col("q").alias(query_col),
        nrel.alias("n_rel"), hits.alias("hits"),
        F.round(ndcg, 6).alias("ndcg"),
        F.round(mrr, 6).alias("mrr"),
        F.round(recall, 6).alias("recall"),
        F.round(hits.cast("double") / F.lit(float(k)), 6)
        .alias("precision"))
