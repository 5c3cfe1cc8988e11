"""BPE merge learning + encoding: the distributed learner must agree
with an independent in-process reference implementation (dict-based
get_stats/merge, the subword-nmt algorithm re-done from its paper
description) on every merge, and encoding must round-trip."""

import pyspark.sql.functions as F
import pytest

from deepseek_ocr_omnidocbench_spark.operators import bpe as B

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
    "the new low the newest",
]


def ref_learn_bpe(texts, n_merges, min_freq=2):
    """Independent reference: word-freq dict + pair-count dict."""
    vocab = {}
    for t in texts:
        for w in t.split():
            sym = tuple(list(w) + [B.END])
            vocab[sym] = vocab.get(sym, 0) + 1
    merges = []
    for _ in range(n_merges):
        stats = {}
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                stats[(sym[i], sym[i + 1])] = \
                    stats.get((sym[i], sym[i + 1]), 0) + freq
        if not stats:
            break
        # max count, ties lexicographic on (a, b) — mirrors learn_bpe
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for sym, freq in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                 "doc_id int, text string")


def test_merges_match_reference(corpus_df):
    got = B.learn_bpe(corpus_df, n_merges=12, min_freq=2,
                      checkpoint_every=5)
    want = ref_learn_bpe(CORPUS, n_merges=12, min_freq=2)
    assert got == want
    assert len(got) >= 8  # the corpus supports a real merge sequence
    # first merges are the obvious high-frequency pairs
    assert got[0][:2] in {("e", "s"), ("s", "t"), ("n", "e"),
                          ("w", "e"), ("e", "w")}


def test_merges_deterministic_across_partitioning(corpus_df):
    a = B.learn_bpe(corpus_df.repartition(7), n_merges=6)
    b = B.learn_bpe(corpus_df.coalesce(1), n_merges=6)
    assert a == b


def test_encode_roundtrip(corpus_df):
    merges = B.learn_bpe(corpus_df, n_merges=10)
    out = B.bpe_encode(corpus_df, merges).orderBy("doc_id").collect()
    for row in out:
        joined = "".join(row["tokens"]).replace(B.END, " ").strip()
        assert joined == " ".join(row["text"].split())
        assert row["n_tokens"] == len(row["tokens"])


def test_encode_uses_merges(corpus_df):
    merges = B.learn_bpe(corpus_df, n_merges=20)
    out = B.bpe_encode(corpus_df, merges).collect()
    toks = {t for r in out for t in r["tokens"]}
    # multi-char tokens exist => merges actually applied
    assert any(len(t.replace(B.END, "x")) > 1 for t in toks)
    # 'low' appears 6x => should have become a single token
    assert "low" + B.END in toks or "low" in toks


def test_encode_word_greedy_overlap():
    # 'a a a' + merge (a,a): left-to-right non-overlap -> ['aa', 'a</w>']
    merges = [("a", "a"), ("a", B.END)]
    ranks = {p: i for i, p in enumerate(merges)}
    got = B._encode_word("aaa", merges, ranks, {})
    assert got == ["aa", "a" + B.END]


def test_apply_merge_regex_specials(spark):
    # symbols that are regex metacharacters must be literal-quoted
    df = spark.createDataFrame([("( ) ( ) </w>",), ("$ \\ </w>",)],
                               "sym string")
    out = df.select(B.apply_merge(F.col("sym"), "(", ")").alias("m"),
                    B.apply_merge(F.col("sym"), "$", "\\").alias("d")) \
        .collect()
    assert out[0]["m"] == "() () </w>"
    assert out[1]["d"] == "$\\ </w>"


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(0, ""), (1, None), (2, "  ")],
                               "doc_id int, text string")
    assert B.learn_bpe(df, n_merges=3) == []
    out = B.bpe_encode(df, [("a", "b", 5)]).orderBy("doc_id").collect()
    assert [r["tokens"] for r in out] == [[], [], []]


def test_unicode_words(spark):
    df = spark.createDataFrame(
        [(0, "héllo héllo héllo wörld wörld")], "doc_id int, text string")
    merges = B.learn_bpe(df, n_merges=8, min_freq=2)
    want = ref_learn_bpe(["héllo héllo héllo wörld wörld"], 8, 2)
    assert merges == want
    out = B.bpe_encode(df, merges).collect()[0]
    assert "".join(out["tokens"]).replace(B.END, " ").strip() == \
        "héllo héllo héllo wörld wörld"


def test_fertility_query_shape(spark):
    """bpe_fertility: one row per source; fertility >= 1 (a word is at
    least one token) and chars_per_token > 0; sums consistent."""
    import __spark_entry__ as entry

    rows = entry.queries()["bpe_fertility"](
        spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 20
    for r in rows:
        assert r.fertility >= 1.0
        assert r.chars_per_token > 0
        assert r.n_tokens >= r.n_words > 0
        assert abs(r.fertility - r.n_tokens / r.n_words) < 1e-6


class TestWordPiece:
    def test_greedy_longest_match(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.bpe import (
            wordpiece_encode,
        )
        vocab = {"un", "##aff", "##able", "##a", "##f", "##b", "##l",
                 "##e", "u", "##n", "unaff"}
        docs = spark.createDataFrame([(0, "unaffable")],
                                     "doc_id long, text string")
        got = wordpiece_encode(docs, vocab).collect()[0]
        # longest match at cursor: 'unaff' beats 'un'
        assert got["wp_tokens"] == ["unaff", "##able"]
        assert got["wp_n"] == 2

    def test_unk_on_uncoverable(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.bpe import (
            wordpiece_encode,
        )
        vocab = {"a", "##a"}
        docs = spark.createDataFrame([(0, "aaa xyz")],
                                     "doc_id long, text string")
        got = wordpiece_encode(docs, vocab).collect()[0]
        assert got["wp_tokens"] == ["a", "##a", "##a", "[UNK]"]

    def test_vocab_counts_and_single_char_floor(self, spark):
        from deepseek_ocr_omnidocbench_spark.operators.bpe import (
            wordpiece_vocab,
        )
        words = spark.createDataFrame(
            [("abab", 3), ("ab", 2), ("q", 1)],
            "word string, freq long")
        got = {r["piece"]: r["c"]
               for r in wordpiece_vocab(words, min_count=5,
                                        max_len=3).collect()}
        # 'ab' prefix occurrences: abab(3) + ab(2) = 5 -> kept
        assert got["ab"] == 5
        # '##ab' occurs only at position 3 of abab: 3 < 5 -> dropped
        assert "##ab" not in got
        # 'aba' prefix: only abab -> 3 < 5 -> dropped
        assert "aba" not in got
        # '##b': abab positions 2 and 4 (3+3) + ab position 2 (2) = 8
        assert got["##b"] == 8
        # single chars always kept, even below min_count
        assert got["q"] == 1 and got["a"] == 5 and got["##a"] == 3

    def test_roundtrip_concat(self, spark):
        # stripping '##' and concatenating tokens reconstructs the word
        from deepseek_ocr_omnidocbench_spark.operators.bpe import (
            wordpiece_encode, wordpiece_vocab,
        )
        words = spark.createDataFrame(
            [("tokenization", 5), ("token", 9), ("ization", 2)],
            "word string, freq long")
        vocab = {r["piece"] for r in
                 wordpiece_vocab(words, min_count=4, max_len=6).collect()}
        docs = spark.createDataFrame(
            [(0, "tokenization token ization")],
            "doc_id long, text string")
        toks = wordpiece_encode(docs, vocab).collect()[0]["wp_tokens"]
        rebuilt = "".join(t[2:] if t.startswith("##") else " " + t
                          for t in toks).strip()
        assert rebuilt == "tokenization token ization"


# ---- unigram LM (SentencePiece-style) -----------------------------------

def test_unigram_vocab_coverage_and_topk(spark):
    from deepseek_ocr_omnidocbench_spark.operators.bpe import unigram_vocab

    words = spark.createDataFrame(
        [("abab", 10), ("abc", 5)], ["word", "freq"])
    v = {r.piece: r.score for r in
         unigram_vocab(words, vocab_size=2, max_len=3).collect()}
    # every single char survives regardless of rank
    assert {"a", "b", "c"} <= set(v)
    # positional weighting: 'ab' occurs twice in abab (2*10) + once in
    # abc (5) = 25; rank-2 tie at 10 (aba/ab a/ba/bab) resolves by
    # piece asc -> 'aba'
    assert v["ab"] == 25
    assert "aba" in v and "bc" not in v


def test_unigram_segment_viterbi_beats_greedy(spark):
    from deepseek_ocr_omnidocbench_spark.operators.bpe import (
        unigram_segment)

    # mass = 303 (9 bits): cost(ab)=9-7=2, cost(bc)=9-8=1, singles 8.
    # greedy longest-first takes 'ab'+'c' = 2+8 = 10; Viterbi takes
    # 'a'+'bc' = 8+1 = 9.
    vocab = spark.createDataFrame(
        [("ab", 100), ("bc", 200), ("a", 1), ("b", 1), ("c", 1)],
        ["piece", "score"])
    words = spark.createDataFrame([("abc",)], ["word"])
    out = unigram_segment(words, vocab).collect()[0]
    assert out.pieces == ["a", "bc"]
    assert out.cost_bits == 9
    assert out.n_pieces == 2


def test_unigram_segment_tie_prefers_longer_final_piece(spark):
    from deepseek_ocr_omnidocbench_spark.operators.bpe import (
        unigram_segment)

    # mass = 23 (5 bits): cost(ab)=cost(bc)=1, singles 4.
    # 'ab'+'c' and 'a'+'bc' tie at 5; the MIN key encoding prefers the
    # smaller final-piece start -> 'a','bc'
    vocab = spark.createDataFrame(
        [("ab", 10), ("bc", 10), ("a", 1), ("b", 1), ("c", 1)],
        ["piece", "score"])
    words = spark.createDataFrame([("abc",)], ["word"])
    out = unigram_segment(words, vocab).collect()[0]
    assert out.cost_bits == 5
    assert out.pieces == ["a", "bc"]


def test_unigram_segment_single_chars_and_cap(spark):
    from deepseek_ocr_omnidocbench_spark.operators.bpe import (
        unigram_segment)

    # mass = 8 (4 bits): cost(x)=4-3=1, cost(y)=4-2=2
    vocab = spark.createDataFrame(
        [("x", 5), ("y", 3)], ["piece", "score"])
    words = spark.createDataFrame(
        [("xyx",), ("x" * 20,)], ["word"])
    rows = unigram_segment(words, vocab, max_word_len=16).collect()
    assert len(rows) == 1  # 20-char word excluded by the cap
    assert rows[0].pieces == ["x", "y", "x"]
    assert rows[0].cost_bits == 4


def test_unigram_em_round_reweights(spark):
    from deepseek_ocr_omnidocbench_spark.operators.bpe import (
        unigram_em_round, unigram_segment, unigram_vocab)

    words = spark.createDataFrame(
        [("abab", 10), ("ab", 4)], ["word", "freq"])
    # v0: ab=24, ba=10, a=24, b=24 -> mass 82 (7 bits):
    # cost(ab)=2, cost(a)=cost(b)=2, cost(ba)=3 -> abab = ab+ab (4)
    v0 = unigram_vocab(words, vocab_size=3, max_len=2)
    v1 = {r.piece: r.score for r in
          unigram_em_round(words, v0).collect()}
    # 'ab' dominates both segmentations: usage = 2*10 + 1*4 = 24
    assert v1["ab"] == 24
    # unused single chars keep the floor score of 1
    assert v1["a"] == 1 and v1["b"] == 1
    # segmentation under re-estimated scores is stable
    out = {r.word: r.pieces for r in
           unigram_segment(words, spark.createDataFrame(
               list(v1.items()), ["piece", "score"])).collect()}
    assert out["abab"] == ["ab", "ab"]


def test_unigram_segment_plan_shape(spark):
    """One span-x-vocab join (vocab mass broadcast), one collect_list
    groupBy, zero iteration-scaled shuffles: the DP itself adds NO
    exchange."""
    from deepseek_ocr_omnidocbench_spark.operators.bpe import (
        unigram_segment)

    vocab = spark.createDataFrame(
        [("ab", 4), ("a", 1), ("b", 1)], ["piece", "score"])
    words = spark.createDataFrame([("abab",)], ["word"])
    plan = unigram_segment(words, vocab)._jdf.queryExecution() \
        .executedPlan().toString()
    # distinct(words) + groupBy(word) hash exchanges; the vocab join is
    # an explicit broadcast, never a span-table shuffle
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "BroadcastHashJoin" in plan


def test_unigram_segment_full_word_piece(spark):
    from deepseek_ocr_omnidocbench_spark.operators.bpe import (
        unigram_segment)

    # the whole word is itself a cheap piece -> 1-piece segmentation
    vocab = spark.createDataFrame(
        [("abcd", 100), ("a", 1), ("b", 1), ("c", 1), ("d", 1)],
        ["piece", "score"])
    out = unigram_segment(
        spark.createDataFrame([("abcd",)], ["word"]), vocab).collect()[0]
    assert out.pieces == ["abcd"] and out.n_pieces == 1


def test_unigram_segment_uncovered_word_dropped(spark):
    """A word whose tail is unreachable under the vocab (no 'q' piece)
    is DROPPED — matching the oracle's recursive backtrack, which
    never reaches position 0 for it."""
    from deepseek_ocr_omnidocbench_spark.operators.bpe import (
        unigram_segment)

    vocab = spark.createDataFrame(
        [("ab", 5), ("a", 1), ("b", 1)], ["piece", "score"])
    words = spark.createDataFrame([("abq",), ("ab",)], ["word"])
    out = {r.word: r for r in unigram_segment(words, vocab).collect()}
    assert set(out) == {"ab"}
    assert out["ab"].pieces == ["ab"]


def test_unigram_segment_cap_guard(spark):
    import pytest

    from deepseek_ocr_omnidocbench_spark.operators.bpe import (
        unigram_segment)

    vocab = spark.createDataFrame([("a", 1)], ["piece", "score"])
    words = spark.createDataFrame([("a",)], ["word"])
    with pytest.raises(ValueError, match="max_word_len"):
        unigram_segment(words, vocab, max_word_len=32)


def test_unigram_segment_bruteforce_parity(spark):
    """Seeded adversarial sweep vs an independent brute-force DP: 5
    random vocabularies x 8 random words each, including vocabularies
    MISSING a single char (unreachable words must drop).  Checks
    pieces, cost and the (cost, start)-min tie rule bit-for-bit."""
    import random

    from deepseek_ocr_omnidocbench_spark.operators.bpe import (
        unigram_segment)

    def ref(word, scores, max_piece=4):
        mass = sum(scores.values())
        cost = {p: mass.bit_length() - s.bit_length()
                for p, s in scores.items()}
        best = {0: (0, None)}
        for i in range(1, len(word) + 1):
            cands = []
            for j in range(max(0, i - max_piece), i):
                piece = word[j:i]
                if piece in cost and j in best:
                    cands.append((best[j][0] + cost[piece], j))
            if cands:
                best[i] = min(cands)
        if len(word) not in best:
            return None
        pieces, pos = [], len(word)
        while pos > 0:
            j = best[pos][1]
            pieces.insert(0, word[j:pos])
            pos = j
        return pieces, best[len(word)][0]

    rng = random.Random(77)
    for trial in range(5):
        chars = "abc"
        pool = [a + b for a in chars for b in chars] + \
               [a + b + c for a in chars for b in chars for c in chars]
        vocab = {c: rng.randint(1, 50) for c in chars}
        if trial == 3:
            del vocab["c"]  # break coverage: words with 'c' must drop
        for p in rng.sample(pool, 8):
            vocab[p] = rng.randint(1, 50)
        words = ["".join(rng.choice(chars) for _ in range(rng.randint(1, 8)))
                 for _ in range(8)]
        vdf = spark.createDataFrame(list(vocab.items()),
                                    ["piece", "score"])
        wdf = spark.createDataFrame([(w,) for w in set(words)], ["word"])
        got = {r.word: (list(r.pieces), r.cost_bits) for r in
               unigram_segment(wdf, vdf, max_piece_len=4).collect()}
        for w in set(words):
            want = ref(w, vocab)
            if want is None:
                assert w not in got, (trial, w)
            else:
                assert got[w] == (want[0], want[1]), \
                    (trial, w, got.get(w), want)
