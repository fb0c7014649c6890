"""Hand-computed goldens pinning the REFERENCE semantics of the stopword
shingler (createCorpus.scala:111-152) and the subword counter
(getSubwordsFromWETRecords.scala:21-59). The expected values below were
derived by executing the reference algorithm by hand on fixed paragraphs —
they discriminate against the round-1 drifts (33-word list, 1-token step,
tail windows; case-sensitive unstripped subwords excluding the bare
keyword)."""

from collections import Counter

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.functions.text import (
    SHINGLE_STOPWORDS,
    stopword_anchored_windows,
    subword_token_counts,
)


def _windows(spark, text, width=6):
    df = spark.createDataFrame([(text,)], "text string")
    return set(
        df.select(stopword_anchored_windows(F.col("text"), width).alias("w"))
        .collect()[0]["w"]
    )


def test_shingle_stopword_list_is_the_reference_24():
    assert len(SHINGLE_STOPWORDS) == 24
    assert "and" not in SHINGLE_STOPWORDS  # in the round-1 Lucene list, NOT the reference's
    assert {"having", "could", "been", "does"} <= set(SHINGLE_STOPWORDS)


def test_shingles_golden_paragraph(spark):
    # tokens (0-based): 0 The, 1 cat, 2 is, 3 on, 4 the, 5 mat, 6 and,
    # 7 it, 8 was, 9 very, 10 happy, 11 to, 12 be, 13 there, 14 today
    # anchors = even positions 0,2,4,6,8 (last full window starts at 15-6=9)
    # 0 "the"✓  2 "is"✓  4 "the"✓  6 "and"✗(not in the 24-list)  8 "was"✓
    text = "The cat is on the mat and it was very happy to be there today"
    assert _windows(spark, text) == {
        "The cat is on the mat",
        "is on the mat and it",
        "the mat and it was very",
        "was very happy to be there",
    }


def test_shingles_step_two_skips_odd_positions(spark):
    # "x the ..." — "the" sits at odd position 1, which the reference's
    # 2-token advance (positions 0,2,4,…) never visits
    text = "x the aa bb cc dd ee ff"
    assert _windows(spark, text) == set()


def test_shingles_full_windows_only(spark):
    # 5 tokens < width ⇒ no shingle even though it starts with a stopword
    assert _windows(spark, "the aa bb cc dd") == set()
    # exactly 6 ⇒ one window, and no tail windows beyond it
    assert _windows(spark, "the aa bb cc dd ee") == {"the aa bb cc dd ee"}


def test_shingles_distinct(spark):
    # the same anchored window at positions 0 and 6 collapses to one
    text = "the x y z w v the x y z w v extra"
    assert _windows(spark, text) == {"the x y z w v"}


def test_subword_counts_golden(spark):
    # space tokens → punct-stripped lowercase:
    # [scan, the, scanner, re-scan, scan, miser, does, scan]
    # prefix/suffix 'scan' matches: scan×3 (bare keyword INCLUDED),
    # scanner×1 (prefix), re-scan×1 (suffix)
    text = "Scan! the scanner re-scan: (scan) miser DOES scan"
    df = spark.createDataFrame([(text,)], "text string")
    toks = df.select(
        subword_token_counts(F.col("text"), "Scan").alias("t")
    ).collect()[0]["t"]
    assert Counter(toks) == {"scan": 3, "scanner": 1, "re-scan": 1}


def test_repetition_scores_goldens(spark):
    # Hand-computed Gopher-style repetition signals (Rae et al. 2021
    # Table A1, token-level). Per doc:
    #  "a a a a"  tc=7: dup_token 1-1/4; char (4-1)/4; "a a"x3 -> 9/7 cap 1;
    #             no 5-grams -> 0
    #  "the cat sat on the mat"  tc=22: 1-5/6; (17-14)/17; all bigrams
    #             count 1 -> tie-break max(count,len,lex) = "the mat",
    #             7/22; 5-grams unique -> 0
    #  "x y x y x y x y"  tc=15: 1-2/8; (8-2)/8; "x y"x4 -> 12/15;
    #             both 5-grams x2 -> 36/15 cap 1
    #  ""         all zero (total function: no div-by-zero on tc=0)
    from commoncrawlscalatools_spark.functions.text import repetition_scores

    df = spark.createDataFrame(
        [
            ("d1", "a a a a"),
            ("d2", "the cat sat on the mat"),
            ("d3", "x y x y x y x y"),
            ("d4", ""),
        ],
        "doc_id string, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in repetition_scores(df, "text", "doc_id").collect()
    }
    assert rows["d1"] == {
        "doc_id": "d1", "n_tokens": 4,
        "dup_token_frac": 0.75, "dup_token_char_frac": 0.75,
        "top_2gram_char_frac": 1.0, "dup_5gram_char_frac": 0.0,
    }
    assert rows["d2"] == {
        "doc_id": "d2", "n_tokens": 6,
        "dup_token_frac": 0.166667, "dup_token_char_frac": 0.176471,
        "top_2gram_char_frac": 0.318182, "dup_5gram_char_frac": 0.0,
    }
    assert rows["d3"] == {
        "doc_id": "d3", "n_tokens": 8,
        "dup_token_frac": 0.75, "dup_token_char_frac": 0.75,
        "top_2gram_char_frac": 0.8, "dup_5gram_char_frac": 1.0,
    }
    assert rows["d4"] == {
        "doc_id": "d4", "n_tokens": 0,
        "dup_token_frac": 0.0, "dup_token_char_frac": 0.0,
        "top_2gram_char_frac": 0.0, "dup_5gram_char_frac": 0.0,
    }
