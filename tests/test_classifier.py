"""Quality classifier (operators/classifier.py): distributed logistic
regression over hashed bag-of-words. Training must match a single-node
numpy reference (same arithmetic), learn a genuinely separable seed
profile, and be deterministic under re-partitioning; scoring must be
exact inference under a frozen weight table."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators.classifier import (
    hashed_features,
    score_with_weights,
    train_logreg_hashed,
)

DIM = 256


def _two_class_docs(spark, n=120):
    """Positive docs draw from vocab A + shared, negatives from B +
    shared — a real word-distribution signal (deterministic, no RNG)."""
    pos_v = ["alpha", "beta", "gamma"]
    neg_v = ["delta", "epsilon", "zeta"]
    shared = ["the", "of", "data"]
    rows = []
    for i in range(n):
        y = i % 2
        vocab = pos_v if y else neg_v
        words = [vocab[(i + j) % 3] for j in range(6)] + [
            shared[(i + j) % 3] for j in range(4)
        ]
        rows.append((i, " ".join(words), y))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _np_reference(rows, dim, lr, l2, iters, momentum):
    def h(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim

    X, y = [], []
    for _, text, label in rows:
        toks = [t for t in text.split() if t]
        c = {}
        for t in toks:
            c[h(t)] = c.get(h(t), 0) + 1
        X.append({k: v / len(toks) for k, v in c.items()})
        y.append(float(label))
    y = np.array(y)
    w, b = np.zeros(dim), 0.0
    vw, vb = np.zeros(dim), 0.0
    for _ in range(iters):
        m = np.array([sum(w[k] * v for k, v in x.items()) for x in X]) + b
        r = 1 / (1 + np.exp(-m)) - y
        g = np.zeros(dim)
        for xi, ri in zip(X, r):
            for k, v in xi.items():
                g[k] += v * ri
        vw = momentum * vw + (g / len(y) + l2 * w)
        vb = momentum * vb + r.mean()
        w -= lr * vw
        b -= lr * vb
    return w, b


def test_training_matches_numpy_reference(spark):
    docs = _two_class_docs(spark, n=40)
    rows = [(r["doc_id"], r["text"], r["y"]) for r in docs.collect()]
    w, b = train_logreg_hashed(
        docs, F.col("y") == 1, dim=DIM, lr=1.0, l2=1e-4, iters=5, momentum=0.9
    )
    w_ref, b_ref = _np_reference(rows, DIM, lr=1.0, l2=1e-4, iters=5, momentum=0.9)
    assert np.allclose(np.array(w), w_ref, rtol=1e-9, atol=1e-12)
    assert abs(b - b_ref) < 1e-12


def test_training_learns_separable_profile_and_is_partition_invariant(spark):
    docs = _two_class_docs(spark)
    w, b = train_logreg_hashed(
        docs, F.col("y") == 1, dim=DIM, lr=10.0, iters=40
    )
    w2, b2 = train_logreg_hashed(
        docs.repartition(7), F.col("y") == 1, dim=DIM, lr=10.0, iters=40
    )
    assert np.allclose(np.array(w), np.array(w2), rtol=1e-9)
    wdf = spark.createDataFrame(
        pd.DataFrame({"feat": range(DIM), "w": w})
    )
    scored = score_with_weights(docs, wdf, b, dim=DIM).join(
        docs.select("doc_id", "y"), "doc_id"
    )
    acc = scored.select(
        ((F.col("quality_score") > 0.5) == (F.col("y") == 1)).cast("int").alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert acc >= 0.95, acc


def test_scoring_zero_token_doc_and_hand_value(spark):
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "   ")], "doc_id long, text string"
    )
    def h(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % DIM

    w = np.zeros(DIM)
    w[h("alpha")] = 3.0
    w[h("beta")] = -1.5
    bias = 0.25
    wdf = spark.createDataFrame(pd.DataFrame({"feat": range(DIM), "w": w}))
    got = {
        r["doc_id"]: r["quality_score"]
        for r in score_with_weights(docs, wdf, bias, dim=DIM).collect()
    }
    expect1 = 1 / (1 + np.exp(-((2 / 3) * 3.0 + (1 / 3) * -1.5 + bias)))
    assert got[1] == round(float(expect1), 6)
    assert got[2] == round(float(1 / (1 + np.exp(-bias))), 6)


def test_hashed_features_tf_normalized(spark):
    docs = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    rows = {r["feat"]: r["x"] for r in hashed_features(docs, dim=DIM).collect()}
    assert sorted(rows.values()) == [1 / 3, 2 / 3]
