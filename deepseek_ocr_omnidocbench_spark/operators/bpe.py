"""Distributed byte-pair-encoding: learn a merge table over a corpus
and tokenize with it — the subword-vocabulary step of a training-data
pipeline (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"; the same merge-learning loop ships in
subword-nmt and as tokenizers' BpeTrainer).

Scale design (the part that matters at 100 TB):

- **One corpus pass, ever.**  BPE statistics only depend on the word
  frequency table, so the corpus is reduced to ``(word, freq)`` with a
  single explode + groupBy shuffle.  Every later iteration runs on the
  DISTINCT-WORD table, which is ~10^8 rows for a 10^12-doc crawl —
  three orders of magnitude smaller than the corpus and trivially
  partitioned by word hash.
- **Iterations are cheap, flat dataflows.**  A merge iteration is:
  adjacent-pair counts (explode + sum(freq) groupBy on the vocab
  table), a LIMIT-1 argmax collect (one row to the driver — the merge
  DECISION is inherently sequential, the counting is not), and one
  ``regexp_replace`` over the symbol string.  No joins, no growing
  state per row.
- **Symbols live in ONE space-joined string column**, not an array:
  applying a merge is a single non-overlapping left-to-right
  ``regexp_replace`` (exactly BPE's replacement semantics), which stays
  inside whole-stage codegen; an array fold would be a per-row lambda
  tree (measured ~4x slower elsewhere in this repo) and array columns
  serialize badly through checkpoints.
- **Lineage is truncated** every ``checkpoint_every`` merges with a
  localCheckpoint of the (narrow: string + long) vocab frame, so the
  plan does not accumulate ``n_merges`` nested regexp_replace nodes.

Encoding applies the learned merge ranks per word in an Arrow-batched
pandas UDF with a per-batch word cache — word frequency follows Zipf,
so the cache hit rate is ~95%+ and the cost is ~O(distinct words per
batch), not O(tokens).
"""

from __future__ import annotations

import re
from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker symbol (subword-nmt convention)

_WS = r"\s+"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split words — the single corpus-wide
    shuffle BPE learning needs."""
    return (docs
            .select(F.explode(F.split(F.trim(F.col(text_col)), _WS))
                    .alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def init_symbols(word: Column) -> Column:
    """'abc' -> 'a b c </w>': characters + end marker, space-joined.
    Symbols never contain whitespace (words are whitespace-split), so a
    single space is an unambiguous symbol separator."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat_ws(" ", F.concat(chars, F.array(F.lit(END))))


def pair_counts(vocab: DataFrame, sym_col: str = "sym",
                freq_col: str = "freq") -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    (a, b, cnt).  Every adjacent occurrence counts (subword-nmt
    get_stats semantics), including overlapping repeats."""
    # guard: sequence(1, 0) DESCENDS in Spark, so a fully-merged
    # single-symbol word must yield an empty pair list, not [1, 0]
    pairs = F.expr(
        f"case when size(split({sym_col}, ' ')) < 2 then "
        f"  array()::array<struct<a string, b string>> else "
        f"transform(sequence(1, size(split({sym_col}, ' ')) - 1), "
        f"i -> struct(element_at(split({sym_col}, ' '), i) as a, "
        f"            element_at(split({sym_col}, ' '), i + 1) as b)) end")
    return (vocab
            .select(freq_col, F.explode(pairs).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum(freq_col).alias("cnt")))


def _java_quote(s: str) -> str:
    """Literal-quote a symbol for a Java regex (\\Q...\\E, with embedded
    \\E split-escaped)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def apply_merge(sym: Column, a: str, b: str) -> Column:
    """Replace every non-overlapping 'a b' symbol bigram with 'ab' —
    regexp_replace scans left-to-right non-overlapping, which is
    exactly BPE's replacement rule ('a a a' + merge(a,a) -> 'aa a')."""
    pat = "(?<!\\S)" + _java_quote(a) + " " + _java_quote(b) + "(?!\\S)"
    repl = re.sub(r"([\\$])", r"\\\1", a + b)
    return F.regexp_replace(sym, pat, repl)


def learn_bpe(docs: DataFrame, text_col: str = "text",
              n_merges: int = 50, min_freq: int = 2,
              checkpoint_every: int = 10) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(a, b, count), ...] in
    merge order.  Stops early when the best pair's count < min_freq.

    The per-iteration collect is ONE row (the argmax pair) — the merge
    decision is sequential by definition; all counting stays
    distributed.  Ties break on (a, b) lexicographic order so the merge
    table is deterministic across partitionings and cluster sizes.
    """
    vocab = (word_freq_table(docs, text_col)
             .select(init_symbols(F.col("word")).alias("sym"), "freq"))
    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        best = (pair_counts(vocab)
                .orderBy(F.desc("cnt"), "a", "b").limit(1).collect())
        if not best or best[0]["cnt"] < min_freq:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = vocab.withColumn("sym", apply_merge(F.col("sym"), a, b))
        if (it + 1) % checkpoint_every == 0:
            # narrow frame (string, long): truncate the regexp_replace
            # lineage chain before it grows O(n_merges) deep
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def _encode_word(word: str, merges: list[tuple[str, str]],
                 ranks: dict, cache: dict) -> list[str]:
    got = cache.get(word)
    if got is not None:
        return got
    sym = list(word) + [END]
    while len(sym) > 1:
        best: Optional[int] = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = merges[best]
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    cache[word] = sym
    return sym


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """array<string>-returning pandas UDF tokenizing text with a learned
    merge table.  ``merges`` is a plain Python list (the merge table is
    tiny — 10^4-10^5 pairs — and ships in the serialized closure, the
    same way every tokenizer distributes its vocab)."""
    pairs = [(a, b) for a, b, *_ in merges]
    ranks = {p: i for i, p in enumerate(pairs)}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: [tok for w in (t or "").split()
                       for tok in _encode_word(w, pairs, ranks, cache)])

    return enc


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """Add ``tokens`` (array<string>) and ``n_tokens`` columns."""
    enc = bpe_encode_udf(merges)
    return (docs
            .withColumn("tokens", enc(F.col(text_col)))
            .withColumn("n_tokens", F.size("tokens")))


# --- WordPiece (greedy longest-match-first) --------------------------------
#
# The BERT-family tokenizer (Wu et al. 2016; Devlin et al. 2019): encode
# each word by repeatedly taking the LONGEST vocabulary piece matching at
# the cursor, with non-initial pieces spelled '##'+s.  Unlike BPE's
# rank-replay, encoding depends only on set membership, so the whole
# tokenizer — vocabulary construction AND the greedy walk — is
# deterministic integer/string work that replays exactly in SQL.
#
# Vocabulary here is the frequency variant: every positional substring
# piece (prefix form or ## form, length <= max_len) whose weighted
# occurrence count across the distinct-word table reaches min_count,
# plus ALL single-character pieces in both forms (the coverage floor
# that bounds UNK to genuinely unseen characters).  Scale shape mirrors
# learn_bpe: one corpus explode+groupBy to (word, freq), then all work
# runs on the Zipf-small distinct-word table (substring explode is
# O(len * max_len) per DISTINCT word).


def wordpiece_vocab(words: DataFrame, min_count: int = 2,
                    max_len: int = 6, word_col: str = "word",
                    freq_col: str = "freq") -> DataFrame:
    """(piece, c) vocabulary from a (word, freq) table.

    piece = word[i:i+l] for i = 1 (as-is) or i > 1 ('##' + s),
    l <= max_len; kept when sum(freq over positional occurrences)
    >= min_count OR the piece is a single character (either form)."""
    w = F.col(word_col)
    subs = (words
            .select(w.alias("_w"), F.col(freq_col).alias("_f"),
                    F.explode(F.sequence(F.lit(1), F.length(w)))
                    .alias("i"))
            .select("_w", "_f", "i",
                    F.explode(F.sequence(
                        F.lit(1),
                        F.least(F.lit(max_len),
                                F.length("_w") - F.col("i") + 1)))
                    .alias("l"))
            .select(F.when(F.col("i") == 1,
                           F.expr("substring(_w, i, l)"))
                    .otherwise(F.concat(F.lit("##"),
                                        F.expr("substring(_w, i, l)")))
                    .alias("piece"),
                    F.col("_f")))
    counts = subs.groupBy("piece").agg(F.sum("_f").alias("c"))
    single = F.length(F.regexp_replace("piece", r"^##", "")) == 1
    return counts.where((F.col("c") >= min_count) | single)


def wordpiece_encode_udf(vocab: set[str], unk: str = "[UNK]",
                         max_word_len: int = 200):
    """array<string> pandas UDF: greedy longest-match WordPiece encode.
    ``vocab`` ships in the closure like the BPE merge table (model-
    sized); per-batch word cache exploits the Zipf distribution."""
    vset = frozenset(vocab)

    def _word(w: str, cache: dict) -> list:
        got = cache.get(w)
        if got is not None:
            return got
        out: list = []
        if len(w) > max_word_len:
            out = [unk]
        else:
            start = 0
            while start < len(w):
                end, cur = len(w), None
                while start < end:
                    piece = w[start:end]
                    if start > 0:
                        piece = "##" + piece
                    if piece in vset:
                        cur = piece
                        break
                    end -= 1
                if cur is None:
                    out = [unk]
                    break
                out.append(cur)
                start = end
        cache[w] = out
        return out

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        return texts.map(
            lambda t: [tok for w in (t or "").split()
                       for tok in _word(w, cache)])

    return enc


def wordpiece_encode(docs: DataFrame, vocab: set[str],
                     text_col: str = "text",
                     unk: str = "[UNK]") -> DataFrame:
    """Add ``wp_tokens`` (array<string>) and ``wp_n`` columns."""
    enc = wordpiece_encode_udf(vocab, unk=unk)
    return (docs
            .withColumn("wp_tokens", enc(F.col(text_col)))
            .withColumn("wp_n", F.size("wp_tokens")))


# --- Unigram LM (SentencePiece-style) segmentation -------------------------
#
# The third of the big-three subword tokenizers next to learn_bpe and
# wordpiece_vocab/encode (Kudo 2018): a piece inventory scored by
# corpus weight, and per-word segmentation by VITERBI — the maximum-
# total-score split, not WordPiece's greedy longest match.
#
# Distributed + exact by construction:
#  * inventory scores are BIGINT corpus weights (frequency-initialized,
#    the SentencePiece seed stage; unigram_em_round re-estimates them
#    from actual segmentation usage — the EM step — still in bigints);
#  * the Viterbi objective uses INTEGER BIT-LENGTH COSTS,
#    cost(piece) = bitlen(mass) - bitlen(score) — the exact-integer
#    stand-in for ceil(-log2 p) (true float log-probs are libm calls
#    whose last ulp differs between the JVM and other engines; bit
#    lengths via length(bin(x)) are identical everywhere).  Minimizing
#    total cost penalizes over-splitting exactly the way the real
#    negative log likelihood does;
#  * the DP is ROW-LOCAL: candidate spans collect per word
#    (<= max_word_len * max piece len structs) and one F.aggregate fold
#    builds the best-cost array position by position, a second fold
#    walks the backpointers — no driver loop, no iteration-scaled
#    shuffles, words segment independently across the cluster;
#  * ties break deterministically: the DP key packs
#    (total_cost * 32 + piece_start) under MIN, so equal costs prefer
#    the SMALLER start = the longer final piece, in any engine.

_UNI_TIE = 32  # start-encoding base; requires max_word_len < 32
_UNI_UNREACH = 1 << 40  # sentinel key for unreachable DP positions:
# array_min over an EMPTY array must not be relied on to yield NULL —
# measured on Spark 4.1: it IS null when the fold is the only computed
# column, but evaluates to 0 when co-projected with other expressions
# (unsafe-array null-bit loss in the larger codegen unit).  An explicit
# coalesce to this sentinel keeps unreachability a VALUE, not a null.
# Chains through sentinel positions only grow the key (each step adds
# <= (63<<5)+31), so "reachable" is exactly key < _UNI_UNREACH.


def unigram_vocab(words: DataFrame, vocab_size: int = 200,
                  max_len: int = 6, word_col: str = "word",
                  freq_col: str = "freq") -> DataFrame:
    """(piece, score) inventory: every substring of length <= max_len
    weighted by positional occurrences x word frequency; the top
    ``vocab_size`` multi-char pieces by (score desc, piece asc) plus
    ALL single characters (the coverage floor Viterbi needs so every
    in-corpus word stays segmentable).

    The top-k is one global sort of the piece-count table — bounded by
    distinct substrings (<< corpus size), the same inherently-global
    step every tokenizer trainer has."""
    from pyspark.sql import Window

    w = F.col(word_col)
    subs = (words
            .select(w.alias("_w"), F.col(freq_col).alias("_f"),
                    F.explode(F.sequence(F.lit(1), F.length(w)))
                    .alias("i"))
            .select("_w", "_f", "i",
                    F.explode(F.sequence(
                        F.lit(1),
                        F.least(F.lit(max_len),
                                F.length("_w") - F.col("i") + 1)))
                    .alias("l"))
            .select(F.expr("substring(_w, i, l)").alias("piece"),
                    F.col("_f")))
    counts = subs.groupBy("piece").agg(F.sum("_f").alias("score"))
    rk = F.row_number().over(
        Window.orderBy(F.desc("score"), F.asc("piece")))
    multi = (counts.where(F.length("piece") > 1)
             .withColumn("rk", rk).where(F.col("rk") <= vocab_size)
             .drop("rk"))
    return multi.unionByName(counts.where(F.length("piece") == 1))


def unigram_segment(words: DataFrame, vocab: DataFrame,
                    word_col: str = "word", max_word_len: int = 16,
                    max_piece_len: int = 6) -> DataFrame:
    """Viterbi segmentation of each distinct word under a
    (piece, score) vocabulary -> (word, pieces array<string>,
    n_pieces, cost_bits) where cost_bits = sum over chosen pieces of
    bitlen(mass) - bitlen(score), minimized (mass = total inventory
    score — the exact-integer ceil(-log2 p) objective; see the module
    note).

    Scale shape: ONE join (word spans x vocab, both sides bounded) —
    the inventory mass rides in as a 1-row broadcast aggregate — one
    groupBy collecting <= max_word_len * max_piece_len span structs
    per word, then two row-local folds (DP forward, backtrack) — the
    corpus-sized explode BPE/WordPiece also pay, with zero
    iteration-scaled shuffles on top.  Words longer than
    ``max_word_len`` are excluded (cap and route like the giant-doc
    paths); positions unreachable under the vocab (a character with no
    single-char piece) yield NULL pieces — unigram_vocab's coverage
    floor prevents that for in-corpus text."""
    if max_word_len >= _UNI_TIE:
        raise ValueError(
            f"max_word_len must be < {_UNI_TIE}: the DP key packs the "
            "backpointer base-_UNI_TIE, a larger start would corrupt it")
    wd = (words.select(F.col(word_col).alias("word")).distinct()
          .where((F.length("word") >= 1)
                 & (F.length("word") <= max_word_len)))
    spans = (wd
             .select("word",
                     F.explode(F.sequence(
                         F.lit(0), F.length("word") - 1)).alias("start"))
             .select("word", "start",
                     F.explode(F.sequence(
                         F.lit(1),
                         F.least(F.lit(max_piece_len),
                                 F.length("word") - F.col("start"))))
                     .alias("l"))
             .select("word", "start",
                     (F.col("start") + F.col("l")).alias("end"),
                     F.expr("substring(word, start + 1, l)")
                     .alias("piece")))
    mass = vocab.agg(F.sum("score").alias("_mass"))
    costed = (vocab.select("piece", "score").join(F.broadcast(mass))
              .select("piece",
                      (F.length(F.bin("_mass"))
                       - F.length(F.bin("score"))).cast("long")
                      .alias("cost")))
    # the costed inventory is model-sized (vocab_size + alphabet):
    # broadcast it so the span join never shuffles the span table
    scored = (spans.join(F.broadcast(costed), "piece")
              .select("word",
                      F.struct(F.col("end").cast("long").alias("end"),
                               F.col("start").cast("long").alias("start"),
                               F.col("cost").alias("cost"))
                      .alias("sp")))
    packed = (scored.groupBy("word")
              .agg(F.collect_list("sp").alias("spans"))
              .select("word", "spans",
                      F.length("word").cast("long").alias("L")))

    tie = _UNI_TIE
    best = F.aggregate(
        F.sequence(F.lit(1), F.col("L")),
        F.array(F.lit(0).cast("long")),
        lambda acc, i: F.concat(acc, F.array(F.coalesce(
            F.array_min(F.transform(
                F.filter(F.col("spans"), lambda s: s["end"] == i),
                lambda s: (F.shiftright(F.element_at(acc,
                                                     (s["start"] + 1)
                                                     .cast("int")), 5)
                           + s["cost"]) * tie + s["start"])),
            F.lit(_UNI_UNREACH).cast("long")))))
    dp = packed.select("word", "L", best.alias("best"))

    def _bp_start(pos):
        # decode the backpointer from the key at position `pos`
        return F.pmod(
            F.element_at(F.col("best"), (pos + 1).cast("int")), tie)

    walk = F.aggregate(
        F.sequence(F.lit(1), F.col("L")),
        F.struct(F.col("L").alias("pos"),
                 F.array().cast("array<string>").alias("pieces")),
        lambda a, _: F.when(
            a["pos"] > 0,
            F.struct(
                _bp_start(a["pos"]).alias("pos"),
                F.concat(
                    F.array(F.substring(
                        F.col("word"),
                        (_bp_start(a["pos"]) + 1).cast("int"),
                        (a["pos"] - _bp_start(a["pos"])).cast("int"))),
                    a["pieces"]).alias("pieces"))).otherwise(a))
    # words whose final position is unreachable under the vocab (a
    # character with no single-char piece) are DROPPED — matching the
    # recursive-backtrack oracle, which never reaches pos 0 for them,
    # and the no-span case (inner join) which already drops.  The
    # check is the sentinel VALUE (see _UNI_UNREACH), never null
    # propagation out of the fold.  Call unigram_vocab for the
    # coverage floor if every word must survive.
    final_key = F.element_at(F.col("best"), (F.col("L") + 1).cast("int"))
    return (dp
            .where(final_key < _UNI_UNREACH)
            .select("word", "L", walk.alias("w"),
                    F.shiftright(final_key, 5).alias("cost_bits"))
            .select("word", F.col("w")["pieces"].alias("pieces"),
                    F.size(F.col("w")["pieces"]).cast("long")
                    .alias("n_pieces"),
                    F.col("cost_bits")))


def unigram_em_round(words: DataFrame, vocab: DataFrame,
                     word_col: str = "word", freq_col: str = "freq",
                     max_word_len: int = 16,
                     max_piece_len: int = 6) -> DataFrame:
    """One EM re-estimation round (the SentencePiece M-step over the
    Viterbi E-step): segment every word under the current scores,
    recount piece usage weighted by word frequency, return the
    re-scored (piece, score) table (single-char pieces keep at least
    score 1 so coverage never collapses).  Two groupBys on top of
    unigram_segment — still bigint-exact."""
    seg = unigram_segment(words, vocab, word_col=word_col,
                          max_word_len=max_word_len,
                          max_piece_len=max_piece_len)
    usage = (seg.join(words.select(F.col(word_col).alias("word"),
                                   F.col(freq_col).alias("freq")), "word")
             .select(F.explode("pieces").alias("piece"), "freq")
             .groupBy("piece").agg(F.sum("freq").alias("score")))
    floor = (vocab.where(F.length("piece") == 1)
             .join(usage.select("piece"), "piece", "left_anti")
             .select("piece", F.lit(1).cast("long").alias("score")))
    return usage.unionByName(floor)
