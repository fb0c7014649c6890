"""Corpus export sinks.

Reference analogs:
  * S12 file sink — one text file per record with header lines
    (saveresults/.../SaveResultsToFile.scala:72-117). Re-expressed as a
    distributed text write: the per-record file layout becomes one line-
    delimited record block per row, partitioned by TLD — a million tiny
    files is an anti-pattern at scale, so the "file per record" contract
    is carried by (filename, body) columns instead.
  * S9 JDBC sink — corpus export to MySQL/MariaDB
    (createCorpusPostSVMToMySQL.scala:321). Thin passthrough over
    df.write.jdbc (no database in this sandbox; untested here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_records(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tld_col: str | None = None,
) -> DataFrame:
    """(filename, tld, record) rows; record carries the reference's
    header-lines-then-body layout (SaveResultsToFile.scala:72-117)."""
    tld = F.col(tld_col) if tld_col else F.lit("unknown")
    filename = F.concat(tld, F.lit("-"), F.md5(F.col(text_col)), F.lit(".txt"))
    record = F.concat(
        F.lit("ID: "), F.col(id_col).cast("string"), F.lit("\n"),
        F.lit("FILENAME: "), filename, F.lit("\n\n"),
        F.col(text_col),
    )
    return docs.select(
        filename.alias("filename"), tld.alias("tld"), record.alias("record")
    )


def write_corpus_text(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    tld_col: str | None = None,
) -> None:
    """Partitioned text export (one directory per TLD, records separated by
    a blank line); coalesce-per-partition instead of file-per-record."""
    recs = corpus_records(docs, id_col, text_col, tld_col)
    (
        recs.withColumn("value", F.concat(F.col("record"), F.lit("\n")))
        .select("tld", "value")
        .write.mode("overwrite")
        .partitionBy("tld")
        .text(out_dir)
    )


def write_jdbc(docs: DataFrame, url: str, table: str, properties: dict) -> None:
    """Reference S9: df.write.jdbc passthrough (batched inserts handled by
    the connector; the reference's hand-rolled 1000-row batching —
    WetPathLoader.scala:186-213 — is obsolete)."""
    docs.write.mode("append").jdbc(url, table, properties=properties)
