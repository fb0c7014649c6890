"""Corpus export sinks (reference S12 file sink semantics)."""

import glob
import os

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.sources.exports import corpus_records, write_corpus_text


def _docs(spark):
    rows = [
        (1, "first document body text here", "com"),
        (2, "second document body text here", "org"),
        (3, "third document body text here", "com"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "tld"])


def test_corpus_record_layout(spark):
    recs = {r["filename"]: r for r in corpus_records(_docs(spark), tld_col="tld").collect()}
    assert len(recs) == 3
    for fn, r in recs.items():
        assert fn.endswith(".txt") and fn.startswith(r["tld"] + "-")
        lines = r["record"].split("\n")
        assert lines[0].startswith("ID: ")
        assert lines[1] == f"FILENAME: {fn}"
        assert lines[2] == "" and lines[3].endswith("text here")


def test_write_partitioned_by_tld(spark, tmp_path):
    out = str(tmp_path / "corpus")
    write_corpus_text(_docs(spark), out, tld_col="tld")
    parts = sorted(os.path.basename(p) for p in glob.glob(f"{out}/tld=*"))
    assert parts == ["tld=com", "tld=org"]
    com_text = "".join(
        open(f).read() for f in glob.glob(f"{out}/tld=com/*.txt") + glob.glob(f"{out}/tld=com/part-*")
    )
    assert "first document body" in com_text and "third document body" in com_text


def test_write_jdbc_builds_correct_writer(spark, monkeypatch):
    """S9 JDBC sink (createCorpusPostSVMToMySQL.scala:321): no database in
    this sandbox, so assert the exact writer invocation (append-mode
    df.write.jdbc with url/table/properties passed through)."""
    from commoncrawlscalatools_spark.sources.exports import write_jdbc

    df = spark.range(3).withColumnRenamed("id", "x")
    calls = {}

    def fake_jdbc(self, url, table, mode=None, properties=None):
        calls.update(url=url, table=table, mode=mode, properties=properties)

    monkeypatch.setattr(
        "pyspark.sql.readwriter.DataFrameWriter.jdbc", fake_jdbc, raising=True
    )
    write_jdbc(df, "jdbc:mysql://db:3306/corpus", "pilot_export",
               {"user": "u", "password": "p", "driver": "com.mysql.cj.jdbc.Driver"})
    assert calls["url"] == "jdbc:mysql://db:3306/corpus"
    assert calls["table"] == "pilot_export"
    assert calls["properties"]["driver"] == "com.mysql.cj.jdbc.Driver"
