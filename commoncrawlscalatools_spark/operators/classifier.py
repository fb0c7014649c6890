"""Quality classifier: logistic regression over hashed bag-of-words.

The GPT-3 / PaLM data pipelines scored web documents with a simple linear
classifier over hashed token features (positive class = a curated quality
corpus) and kept documents stochastically by score — the quality-filter
stage between raw crawl and training corpus. The reference has no
counterpart (its quality gate is the SVM half of the corpus workflow,
classified_warc_document — see operators cited in plans/corpus.py); this
is the LLM-pipeline extension family alongside dedup/pii/sampling.

Everything is deterministic and engine-reproducible:
  * feature hash = md5-derived 32-bit int mod `dim` (the same
    `md5_hash32` trick every oracle-checked hash in this repo uses), so
    an external SQL engine reproduces the exact feature indices;
  * training starts from zeros with fixed lr / l2 / iterations — no RNG;
  * scoring with a FROZEN weight table is pure DataFrame arithmetic, so
    the gated query verifies the trained model's scoring semantics
    value-for-value (the ann_ivf_topk_trained precedent: freeze the
    learned state, oracle the inference path around it).

Scale shape (100 TB corpus, D = 2^15 features):
  * the (doc, feature, x) projection is ONE explode + hash-aggregate,
    persisted across iterations (released via cachehooks when the caller
    drops the result);
  * each training iteration is exactly two shuffles — groupBy(doc) for
    the margin, groupBy(feature) for the gradient — both map-side
    combinable; the weight vector moves driver←→executors as one
    O(D) collect + one broadcast-joined D-row relation per iteration
    (D is a constant ~32k, never corpus-sized);
  * scoring is one broadcast join + one groupBy(doc) — no iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.functions.text import md5_hash32, ws_tokens

DEFAULT_DIM = 1 << 15


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """(id, feat, x) rows: term frequency of each hashed token, normalized
    by document token count (so short and long documents live on the same
    scale). The document's token count is computed IN-ROW before the
    explode and carried through it, so normalization costs no second
    aggregate and no self-join — the whole projection is one explode +
    ONE hash aggregate. Docs with zero tokens drop out (they carry no
    signal either way)."""
    toks = df.select(
        F.col(id_col),
        F.size(ws_tokens(F.col(text_col))).alias("__n"),
        F.explode(ws_tokens(F.col(text_col))).alias("__t"),
    )
    return (
        toks.groupBy(id_col, "__n", (md5_hash32(F.col("__t")) % dim).alias("feat"))
        .agg(F.count("*").alias("__c"))
        .select(id_col, "feat", (F.col("__c") / F.col("__n")).alias("x"))
    )


def train_logreg_hashed(
    df: DataFrame,
    label_col: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
    lr: float = 2.0,
    l2: float = 1e-6,
    iters: int = 30,
    momentum: float = 0.9,
) -> tuple[list[float], float]:
    """Batch gradient descent (classical momentum) for logistic regression
    on hashed features. Returns (weights, bias) as plain Python floats —
    freeze them as a parquet table (tools/make_quality_weights.py) for
    oracle-gated scoring. Momentum matters: a separable seed set drives
    the optimum toward large margins, and plain GD crawls there
    (measured 0.658 accuracy at lr=8/60 iters vs 0.986 with momentum).

    Per iteration: margin pass (broadcast D-row weights ⋈ features →
    groupBy(id) sum), residual join back on the id, gradient pass
    (groupBy(feat) sum → O(D) collect). The driver holds only the weight
    vector; the corpus never leaves the executors."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    feats = hashed_features(df, text_col, id_col, dim).persist()
    labels = df.select(F.col(id_col), label_col.cast("double").alias("__y"))
    n_docs = labels.count()
    w = np.zeros(dim)
    b = 0.0
    vw = np.zeros(dim)
    vb = 0.0
    for _ in range(iters):
        # pandas → Arrow path: the plain-list createDataFrame costs ~5 s
        # PER CALL on this box (fresh pickle worker per job)
        wdf = spark.createDataFrame(
            pd.DataFrame({"feat": np.arange(dim, dtype="int64"), "w": w})
        )
        margins = (
            feats.join(F.broadcast(wdf), "feat")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("w")).alias("__m"))
        )
        resid = (
            labels.join(margins, id_col, "left")
            .select(
                id_col,
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.coalesce("__m", F.lit(0.0)) + b)))
                    - F.col("__y")
                ).alias("__r"),
            )
        )
        grad_rows = (
            feats.join(resid, id_col)
            .groupBy("feat")
            .agg(F.sum(F.col("x") * F.col("__r")).alias("g"))
            .collect()
        )
        grad_b = resid.agg(F.sum("__r")).first()[0] or 0.0
        g = np.zeros(dim)
        for row in grad_rows:
            g[row["feat"]] = row["g"]
        vw = momentum * vw + (g / n_docs + l2 * w)
        vb = momentum * vb + grad_b / n_docs
        w -= lr * vw
        b -= lr * vb
    feats.unpersist()
    return w.tolist(), float(b)


def score_with_weights(
    df: DataFrame,
    weights: DataFrame,
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Quality score per document under a frozen (feat, w) weight table:
    sigmoid(Σ w·tf/n + bias), rounded to 6 dp for engine-portable
    comparison. Zero-token docs score sigmoid(bias). One broadcast join +
    one groupBy(id); the weight table is O(dim), never corpus-sized."""
    feats = hashed_features(df, text_col, id_col, dim)
    margins = (
        feats.join(F.broadcast(weights), "feat")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("__m"))
    )
    base = df.select(id_col)
    return base.join(margins, id_col, "left").select(
        id_col,
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.coalesce("__m", F.lit(0.0)) + bias))),
            6,
        ).alias("quality_score"),
    )
