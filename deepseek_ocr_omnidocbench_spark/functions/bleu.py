"""BLEU score (SURVEY §2.6 A4) — from-scratch corpus/sentence BLEU.

The reference calls HuggingFace ``evaluate``'s bleu per group
(OmniDocBench/metrics 2/cal_metric.py:99-121), which implements the
standard Papineni et al. corpus BLEU: modified n-gram precision up to
4-grams, geometric mean, brevity penalty, with whitespace
tokenization.  This is that formula directly; used inside
``applyInPandas`` per attribute group — Spark supplies the grouping.
"""

from __future__ import annotations

import math
from collections import Counter


def _ngrams(tokens: list[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def corpus_bleu(preds: list[str], refs: list[str], max_n: int = 4) -> float:
    """Corpus BLEU with one reference per prediction."""
    clipped = [0] * max_n
    total = [0] * max_n
    pred_len = ref_len = 0
    for pred, ref in zip(preds, refs):
        pt = pred.split()
        rt = ref.split()
        pred_len += len(pt)
        ref_len += len(rt)
        for n in range(1, max_n + 1):
            pc = _ngrams(pt, n)
            rc = _ngrams(rt, n)
            total[n - 1] += max(0, len(pt) - n + 1)
            clipped[n - 1] += sum(min(c, rc[g]) for g, c in pc.items())
    if pred_len == 0 or any(t == 0 for t in total):
        return 0.0
    if any(c == 0 for c in clipped):
        return 0.0
    log_prec = sum(math.log(c / t) for c, t in zip(clipped, total)) / max_n
    bp = 1.0 if pred_len > ref_len else math.exp(1 - ref_len / max(pred_len, 1))
    return bp * math.exp(log_prec)


def sentence_bleu(pred: str, ref: str, max_n: int = 4) -> float:
    return corpus_bleu([pred], [ref], max_n)
