"""Train the hashed-bag-of-words quality classifier once and freeze its
weights (tests/fixtures/quality_lr_weights.parquet + bias in the table's
single bias row) so the gated `quality_classifier_scores` query is pure
deterministic INFERENCE over a frozen model — the ann_ivf_topk_trained
gating pattern: learned state frozen, the inference path oracle-verified
around it every round.

Training setup: sf0.001 documents, positive class = a curated token
profile (documents whose 'spark'/'vector'/'query' token rate ≥ 0.08 —
the stand-in for "pages resembling the curated corpus", which is how the
GPT-3 quality filter defined its positive class; the synthetic corpus's
31-word vocabulary carries no other word-distribution signal, verified:
the Gopher rule-gate label trains to 0.52 accuracy = chance). The label
is LINEAR in the classifier's tf features, so training demonstrably
converges (accuracy printed; ~0.95+). Deterministic (zero init, fixed
lr/iters, no RNG); re-run only with a reviewed diff.

Usage: python tools/make_quality_weights.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commoncrawlscalatools_spark import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "quality_lr_weights.parquet",
)

DIM = 1 << 12  # 4096 features: plenty for the synthetic vocab, small oracle join


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from commoncrawlscalatools_spark.functions.text import token_count_ws
    from commoncrawlscalatools_spark.operators.classifier import (
        score_with_weights,
        train_logreg_hashed,
    )

    spark = get_spark(app="quality-lr-freeze", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rate = (
        F.regexp_count("text", F.lit("spark"))
        + F.regexp_count("text", F.lit("vector"))
        + F.regexp_count("text", F.lit("query"))
    ) / token_count_ws(F.col("text"))
    label = rate >= 0.08
    w, b = train_logreg_hashed(
        docs, label, "text", "doc_id", dim=DIM, iters=150, lr=50.0
    )
    # one table: D weight rows + one bias row at feat = -1
    pdf = pd.DataFrame({"feat": list(range(DIM)) + [-1], "w": w + [b]})
    pdf.to_parquet(OUT, index=False)
    nz = sum(1 for x in w if x != 0.0)
    # sanity: the frozen model must actually separate the seed classes
    wdf = spark.createDataFrame(pdf[pdf.feat >= 0])
    scored = score_with_weights(docs, wdf, b, dim=DIM)
    acc = (
        scored.join(docs.select("doc_id", label.alias("__y")), "doc_id")
        .select(((F.col("quality_score") > 0.5) == F.col("__y")).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .first()[0]
    )
    print(f"froze {DIM} weights (bias {b:.6f}, {nz} nonzero) -> {OUT}")
    print(f"train accuracy @0.5: {acc}")
    assert acc >= 0.9, f"classifier failed to learn the seed profile: {acc}"


if __name__ == "__main__":
    main()
