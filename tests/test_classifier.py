"""Hashed linear classifier (operators/classifier.py) vs a dense
numpy reference using the identical md5 featurization."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pytest

from deepseek_ocr_omnidocbench_spark.operators.classifier import (
    apply_linear,
    deterministic_weights,
    hashed_features,
    train_logreg,
)
from deepseek_ocr_omnidocbench_spark.operators.dedup import md5_hash64

DIM = 64

DOCS = [
    (0, "good clean prose with many plain words", 1),
    (1, "spam spam buy now spam buy spam", 0),
    (2, "a thoughtful essay about careful writing", 1),
    (3, "buy buy buy now now cheap cheap", 0),
    (4, "plain words and careful prose again", 1),
    (5, "cheap spam now", 0),
]


def _feat_py(text: str, dim: int = DIM) -> dict[int, float]:
    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    terms = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
    c = Counter(int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim
                for t in terms)
    n = len(terms)
    return {b: v / n for b, v in c.items()}


def _dense(docs, dim=DIM):
    X = np.zeros((len(docs), dim))
    for i, (_, text, _) in enumerate(docs):
        for b, v in _feat_py(text, dim).items():
            X[i, b] = v
    y = np.array([d[2] for d in docs], dtype=float)
    return X, y


@pytest.fixture(scope="module")
def feats(spark):
    docs = spark.createDataFrame([(i, t) for i, t, _ in DOCS],
                                 "doc_id long, text string")
    return spark, hashed_features(docs, dim=DIM, hash_fn=md5_hash64)


class TestFeaturize:
    def test_matches_python_replica(self, feats):
        _, f = feats
        got: dict[int, dict[int, float]] = {}
        for r in f.collect():
            got.setdefault(r["doc_id"], {})[r["bucket"]] = r["value"]
        for i, text, _ in DOCS:
            want = _feat_py(text)
            assert got[i] == pytest.approx(want), f"doc {i}"


class TestApply:
    def test_scores_match_numpy(self, feats):
        spark, f = feats
        w = deterministic_weights(DIM, spark)
        wv = {r["bucket"]: r["weight"] for r in w.collect()}
        X, _ = _dense(DOCS)
        wd = np.array([wv[b] for b in range(DIM)])
        want = 1.0 / (1.0 + np.exp(-(X @ wd)))
        got = {r["doc_id"]: r["score"]
               for r in apply_linear(f, w).collect()}
        for i in range(len(DOCS)):
            assert got[i] == pytest.approx(want[i], abs=1e-9)


class TestTrain:
    def test_gd_matches_dense_reference(self, feats):
        spark, f = feats
        labels = spark.createDataFrame([(i, lab) for i, _, lab in DOCS],
                                       "doc_id long, label int")
        w = train_logreg(f, labels, iters=5, lr=2.0)
        wv = {r["bucket"]: r["weight"] for r in w.collect()}

        X, y = _dense(DOCS)
        used = sorted({b for i, t, _ in DOCS for b in _feat_py(t)})
        wd = np.zeros(DIM)
        for _ in range(5):
            p = 1.0 / (1.0 + np.exp(-(X @ wd)))
            g = X.T @ (p - y) / len(DOCS)
            wd[used] -= 2.0 * g[used]
        assert set(wv) == set(used)
        for b in used:
            assert wv[b] == pytest.approx(wd[b], abs=1e-9)

    def test_trained_model_separates(self, feats):
        spark, f = feats
        labels = spark.createDataFrame([(i, lab) for i, _, lab in DOCS],
                                       "doc_id long, label int")
        w = train_logreg(f, labels, iters=30, lr=5.0)
        scores = {r["doc_id"]: r["score"]
                  for r in apply_linear(f, w).collect()}
        for i, _, lab in DOCS:
            assert (scores[i] > 0.5) == bool(lab), (i, scores[i])
