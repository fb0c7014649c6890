"""Bigram-LM perplexity scorer tests (operators/lm.py): hand-computed
counts and NLL on a tiny corpus, held-out OOV scoring, reproducibility."""

import math

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators.lm import (
    doc_bigrams,
    score_bigram_nll,
    train_bigram_lm,
)


def _corpus(spark):
    # bigrams: d1 -> (a,b),(b,a),(a,b); d2 -> (a,c); d3 has no bigram
    rows = [(1, "a b a b"), (2, "a c"), (3, "x")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _nll_micro(c12, c1, v, k=0.5):
    return round(-math.log((c12 + k) / (c1 + k * v)) * 1e6)


def test_train_counts_and_vocab(spark):
    uni, bi, vocab = train_bigram_lm(_corpus(spark))
    bic = {(r["w1"], r["w2"]): r["c12"] for r in bi.collect()}
    unic = {r["w1"]: r["c1"] for r in uni.collect()}
    assert bic == {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1}
    assert unic == {"a": 3, "b": 1}  # bigram-PREFIX counts (last tokens excluded)
    assert vocab.first()["vocab_size"] == 4  # a b c x — x counts (vocab is all tokens)


def test_score_matches_hand_computation(spark):
    d = _corpus(spark)
    uni, bi, vocab = train_bigram_lm(d)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_micro"])
        for r in score_bigram_nll(d, uni, bi, vocab).collect()
    }
    v = 4
    d1 = 2 * _nll_micro(2, 3, v) + _nll_micro(1, 1, v)  # (a,b)x2 + (b,a)
    d2 = _nll_micro(1, 3, v)  # (a,c)
    assert got == {1: (3, d1), 2: (1, d2)}  # doc 3: no bigram -> absent


def test_heldout_oov_scores_without_special_casing(spark):
    d = _corpus(spark)
    uni, bi, vocab = train_bigram_lm(d)
    held = spark.createDataFrame([(9, "z q")], ["doc_id", "text"])
    got = score_bigram_nll(held, uni, bi, vocab).collect()
    # unseen prefix AND pair: nll = -ln(k / (k*V)) = ln(V)
    assert got[0]["n_bigrams"] == 1
    assert got[0]["nll_micro"] == round(math.log(4) * 1e6)


def test_score_deterministic_under_partitioning(spark):
    d = _corpus(spark)
    uni, bi, vocab = train_bigram_lm(d)
    a = sorted(map(tuple, score_bigram_nll(d, uni, bi, vocab).collect()))
    b = sorted(
        map(tuple, score_bigram_nll(d.repartition(5), uni, bi, vocab).collect())
    )
    assert a == b


def test_doc_bigrams_in_row_build(spark):
    # the pair build must not explode raw text: the exploded relation
    # carries only (id, w1, w2)
    cols = doc_bigrams(_corpus(spark)).columns
    assert cols == ["doc_id", "w1", "w2"]
