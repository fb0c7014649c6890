"""Exact duplicate-span removal (distributed substring dedup): interval
merge, per-doc accounting, rewrite fidelity, and the cross-doc-only rule."""

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators import dedup as DD

DOCS = [
    # 1 and 4 are byte-identical -> every position covered, full removal
    (1, "a b c d e f g h i j"),
    # shares a..h with 1/4: two overlapping 4-gram hits merge to [2, 10)
    (2, "z z a b c d e f g h q q"),
    (3, "unique words only here nothing shared at all"),
    (4, "a b c d e f g h i j"),
    # shorter than n -> contributes no n-grams, never flagged
    (5, "tiny"),
    # intra-doc repetition ONLY (same 4-gram twice in one doc): min_docs
    # counts DISTINCT docs, so this must not be flagged
    (6, "p q r s p q r s"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_intervals_merge_overlapping_spans(spark):
    iv = {
        (r["doc_id"], r["s0"], r["e0"])
        for r in DD.dup_span_intervals(_df(spark), n=4).collect()
    }
    assert iv == {(1, 0, 10), (2, 2, 10), (4, 0, 10)}


def test_stats_accounting(spark):
    rows = {
        r["doc_id"]: r.asDict()
        for r in DD.dup_span_stats(_df(spark), n=4).collect()
    }
    assert set(rows) == {1, 2, 4}
    assert rows[1]["tokens_removed"] == 10 and rows[1]["tokens_kept"] == 0
    assert rows[2] == {
        "doc_id": 2,
        "n_tokens": 12,
        "n_dup_spans": 1,
        "tokens_removed": 8,
        "tokens_kept": 4,
    }


def test_removal_rewrite(spark):
    rows = {
        r["doc_id"]: (r["tokens_kept"], r["clean_text"])
        for r in DD.remove_dup_spans(_df(spark), n=4).collect()
    }
    assert rows[2] == (4, "z z q q")
    assert rows[1] == (0, "") and rows[4] == (0, "")
    # unaffected / short / intra-doc-only docs are not rewritten at all
    assert set(rows) == {1, 2, 4}


def test_intra_doc_repetition_not_flagged(spark):
    hit = (
        DD.dup_span_intervals(_df(spark), n=4)
        .where(F.col("doc_id") == 6)
        .count()
    )
    assert hit == 0
    # ...but lowering min_docs to 1 treats occurrence-count duplicates
    # as in-scope and flags them
    assert (
        DD.dup_span_intervals(_df(spark), n=4, min_docs=1)
        .where(F.col("doc_id") == 6)
        .count()
        > 0
    )


def test_separate_islands_counted_separately(spark):
    # two docs sharing two NON-adjacent 4-token spans -> two islands each
    df = spark.createDataFrame(
        [
            (10, "s1 s2 s3 s4 mid1 mid2 t1 t2 t3 t4"),
            (11, "s1 s2 s3 s4 other word t1 t2 t3 t4 tail"),
        ],
        ["doc_id", "text"],
    )
    stats = {r["doc_id"]: r["n_dup_spans"] for r in DD.dup_span_stats(df, n=4).collect()}
    assert stats == {10: 2, 11: 2}
