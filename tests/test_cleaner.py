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


def test_prepare_documents_two_sinks_one_pass(spark, sf_dir, tmp_path):
    """§3.3 composition (plans/prepare.py): one persisted cleaning pass
    feeds BOTH sinks (the reference ran its lineage twice); the two
    outputs are mutually consistent and the hasContent gate holds."""
    from pyspark.sql import functions as F

    from commoncrawlscalatools_spark.plans.prepare import prepare_documents
    from commoncrawlscalatools_spark.plans.state import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path / "prep"))
    # the synthetic docs lack sentence structure; sentencify so the
    # PrepareDocument gates have something to keep (and something to drop)
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(120)
        .withColumn(
            "text",
            F.concat(
                F.upper(F.substring("text", 1, 1)),
                F.expr("substring(text, 2)"),
                F.lit("."),
            ),
        )
    )
    out = prepare_documents(d, store, 0)
    recs = store.read("prepared_records", 0)
    idx = store.read("prepared_index", 0)
    assert out["prepared"] == recs.count() == idx.count() > 0
    j = recs.select("doc_id", F.length("cleaned").alias("n")).join(idx, "doc_id")
    assert j.count() == out["prepared"]
    assert j.filter(F.col("n") != F.col("n_clean_chars")).count() == 0
    assert recs.filter(F.length(F.trim(F.col("cleaned"))) == 0).count() == 0
