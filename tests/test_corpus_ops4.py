"""Round-5 batch 5: duplicated-n-gram repetition gate (Gopher §A1.1
second half) and per-source Jensen-Shannon unigram drift."""

from __future__ import annotations

import math
from collections import Counter

from deepseek_ocr_omnidocbench_spark.operators.textstats import (
    dup_ngram_stats,
    source_js_divergence,
)


class TestDupNgramStats:
    def _stats(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id int, text string")
        return {r["doc_id"]: r for r in
                dup_ngram_stats(df, **kw).collect()}

    def test_clean_text_scores_zero(self, spark):
        out = self._stats(spark, [(0, "a b c d e f g h i j k l m n")])
        for n in range(5, 11):
            assert out[0][f"dup{n}gram_char_frac"] == 0.0, n

    def test_repeated_block_hand_computed(self, spark):
        # "v w x y z" twice back-to-back: the 5-gram "v w x y z" occurs
        # twice (positions 0 and 5); every other 5-gram is unique.
        text = "v w x y z v w x y z"
        out = self._stats(spark, [(0, text)])
        # total word chars = 10 (ten 1-char words); the duplicated
        # 5-gram covers 5 word chars per occurrence, 2 occurrences.
        assert out[0]["dup5gram_char_frac"] == 1.0
        # 10-grams: only one exists (the whole string) -> no duplicate.
        assert out[0]["dup10gram_char_frac"] == 0.0

    def test_partial_duplication_fraction(self, spark):
        # 5-gram "a b c d e" twice, then 6 unique filler words:
        # dup mass = 2 occurrences * 5 chars = 10, total chars = 16.
        text = "a b c d e a b c d e p q r s t u"
        out = self._stats(spark, [(0, text)])
        assert out[0]["dup5gram_char_frac"] == round(10 / 16, 6)

    def test_short_and_empty_docs_zero(self, spark):
        out = self._stats(spark, [(0, "one two"), (1, ""), (2, "   ")])
        for d in (0, 1, 2):
            for n in range(5, 11):
                assert out[d][f"dup{n}gram_char_frac"] == 0.0

    def test_can_exceed_one_on_loopy_text(self, spark):
        # "a" * 20: overlapping duplicated 5-grams count chars each
        # occurrence — the documented non-overlap-corrected estimate.
        text = " ".join(["a"] * 20)
        out = self._stats(spark, [(0, text)])
        assert out[0]["dup5gram_char_frac"] > 1.0


def _jsd_reference(per_source_tokens: dict) -> dict:
    """Independent full-support-union JSD (no absent-mass folding):
    the property the analytic shortcut must reproduce."""
    corpus = Counter()
    for toks in per_source_tokens.values():
        corpus.update(toks)
    gt = sum(corpus.values())
    out = {}
    for src, toks in per_source_tokens.items():
        q_cnt = Counter(toks)
        st = sum(q_cnt.values())
        jsd = 0.0
        for w, gc in corpus.items():
            p = gc / gt
            q = q_cnt.get(w, 0) / st
            m = (p + q) / 2.0
            if p > 0:
                jsd += 0.5 * p * math.log2(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log2(q / m)
        out[src] = jsd
    return out


class TestSourceJsDivergence:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "source string, text string")
        return {r["source"]: r for r in source_js_divergence(df).collect()}

    def test_single_source_is_zero(self, spark):
        out = self._run(spark, [("s0", "the cat sat on the mat")])
        assert out["s0"]["jsd_bits"] == 0.0

    def test_matches_full_support_reference(self, spark):
        corpora = {
            "s0": "the cat sat on the mat the end".split(),
            "s1": "a dog ran over the hill a lot".split(),
            "s2": "quantum flux capacitors hum quietly".split(),
        }
        rows = [(s, " ".join(t)) for s, t in corpora.items()]
        out = self._run(spark, rows)
        ref = _jsd_reference(corpora)
        for s in corpora:
            assert abs(out[s]["jsd_bits"] - ref[s]) < 1e-6, s

    def test_bounded_and_ordered(self, spark):
        # A source matching the corpus-dominant vocabulary drifts less
        # than a disjoint-vocabulary source; all values in [0, 1].
        rows = [("big", "common words common words common words " * 10),
                ("same", "common words common words"),
                ("alien", "zx qy wv uk")]
        out = self._run(spark, rows)
        for s, r in out.items():
            assert 0.0 <= r["jsd_bits"] <= 1.0, s
        assert out["same"]["jsd_bits"] < out["alien"]["jsd_bits"]

    def test_token_and_type_counts(self, spark):
        out = self._run(spark, [("s0", "a b b c c c")])
        assert out["s0"]["n_tokens"] == 6
        assert out["s0"]["n_types"] == 3
