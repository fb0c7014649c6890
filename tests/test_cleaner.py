"""Cleaner golden tests, modeled on PrepareDocumentSpec.scala:17-541:
sentence-start/end trimming, interstitial-line drops, '..' endings
rejected, URL periods not sentence ends, short sentence-final lines kept."""

import pytest
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.functions.cleaner import (
    clean_document_py,
    clean_documents,
    detect_sentence_ending,
    keep_line,
    keep_lines,
)

LONG = "This is a perfectly reasonable sentence with enough tokens to keep."


def test_sentence_ending_detection():
    assert detect_sentence_ending("It ends here.")
    assert detect_sentence_ending("Does it end?")
    assert detect_sentence_ending("It does!")
    # bug-compatible with the reference (takeRight(3) == ".."): a line
    # ENDING in '..' still reads as an ending here; cleanTextBlock's
    # adjacent-period check is what rejects '..' endings (Spec:153)
    assert detect_sentence_ending("trailing dots..")
    assert not detect_sentence_ending("..")
    assert detect_sentence_ending("ellipsis works...")
    assert detect_sentence_ending('He said "stop."')
    assert detect_sentence_ending("quote after period.”")
    assert not detect_sentence_ending("no ending here")


def test_keep_line_rules():
    assert keep_line(LONG, False)
    assert not keep_line("too short line.", False)  # ≤5 tokens, no block
    assert keep_line("ends the block.", True)  # sentence-final exception
    assert not keep_line("1 2 3 4 5 6 7 8 9", False)  # all numeric
    nav = "| | | | | | |"
    assert not keep_line(nav, False)  # <65% alnum tokens


def test_clean_prefix_suffix_trimming():
    raw = "menu item list\n" + LONG + "\nCopyright footer junk"
    out = clean_document_py(raw)
    assert out == LONG


def test_non_sentence_prefix_trimmed():
    raw = "and lowercase junk prefix before The actual sentence starts here and ends properly."
    out = clean_document_py(raw)
    assert out is not None
    assert out.startswith("The actual sentence")
    assert out.endswith("properly.")


def test_url_period_not_ending():
    raw = "Visit https://example.com/a.b for details about everything we offer today."
    out = clean_document_py(raw)
    assert out is not None and out.endswith("today.")


def test_block_without_ending_dropped():
    raw = "this line has many tokens but never terminates with punctuation at all"
    assert clean_document_py(raw) == ""


def test_none_and_empty():
    assert clean_document_py(None) is None
    assert clean_document_py("") == "" 


def test_short_final_line_kept():
    raw = LONG[:-1] + " and\nthe end."
    out = clean_document_py(raw)
    assert out is not None and out.endswith("the end.")


def test_udf_matches_python(spark):
    docs = [
        "menu\n" + LONG + "\nfooter",
        "no ending here at all in this block of words",
        LONG,
    ]
    df = spark.createDataFrame([(d,) for d in docs], ["text"])
    got = [r[0] for r in df.select(clean_documents(F.col("text"))).collect()]
    assert got == [clean_document_py(d) for d in docs]


def test_keep_lines_expr(spark):
    text = LONG + "\nshort one.\n1 2 3 4 5 6 7"
    df = spark.createDataFrame([(text,)], ["text"])
    kept = df.select(keep_lines(F.col("text"))).collect()[0][0]
    assert kept == LONG
