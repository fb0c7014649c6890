"""prepareDocumentsFromTable composed end-to-end — the reference's
table-to-table cleaning job (SURVEY.md §3.3, prepareDocumentsFromTable
.scala:216-284): read → PrepareDocument state-machine clean → filter
hasContent → emit (records, index) to two sinks.

The reference ran `saveToCassandra` twice on the SAME lineage, so the
whole per-row cleaning pipeline executed twice (an accidental 2× cost its
author could not see without an optimizer). Here the cleaned intermediate
is persisted ONCE and both sinks write from it — the cleaner UDF runs one
time per document regardless of sink count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.functions.cleaner import clean_documents
from commoncrawlscalatools_spark.plans.state import SnapshotStore


def prepared_records(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cleaned records with the hasContent gate
    (prepareDocumentsFromTable.scala:244-249,277): rows whose cleaned
    body is empty are dropped, mirroring PrepareDocument.hasContent."""
    cleaned = docs.withColumn("cleaned", clean_documents(F.col(text_col)))
    return cleaned.filter(
        F.col("cleaned").isNotNull() & (F.length(F.trim(F.col("cleaned"))) > 0)
    )


def index_rows(records: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The reference's second output (`:280` "map to index rows"): the
    id-keyed lookup rows for the prepared table — id, cleaned length, and
    a content fingerprint for the dedup-on-read path."""
    return records.select(
        F.col(id_col),
        F.length("cleaned").alias("n_clean_chars"),
        F.md5(F.col("cleaned")).alias("clean_md5"),
    )


def prepare_documents(
    docs: DataFrame,
    store: SnapshotStore,
    version: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """One persisted cleaning pass, two snapshot sinks (records + index)
    — the §3.3 job with the double-action cost removed. Returns counts."""
    recs = prepared_records(docs, text_col, id_col).persist()
    try:
        store.write("prepared_records", recs, version)
        store.write("prepared_index", index_rows(recs, id_col), version, coalesce=4)
        n = store.read("prepared_index", version).count()
    finally:
        recs.unpersist()
    return {"version": version, "prepared": n}
