"""Refilter pipeline (plans/refilter.py): the reference's third
table-to-table job (refilterWETRecords.scala:80-170 + deleteRefiltered
WETRecordsFromSource.scala:71-84) — recompute categories from content,
write refiltered + index tables, delete migrated rows from the source as
one atomic snapshot publish."""

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators.filters import TopicFilterConfig
from commoncrawlscalatools_spark.plans.refilter import (
    legacy_category_string,
    refilter_job,
    refilter_records,
    split_source_for_delete,
)
from commoncrawlscalatools_spark.plans.state import SnapshotStore

CFG = TopicFilterConfig(
    core={"joins": ["join"], "scans": ["scan"]},
    secondary={"joins": ["merge", "hash"], "scans": ["table", "filter"]},
)
LOOSE = TopicFilterConfig(
    core=CFG.core, secondary=CFG.secondary, min_secondary={"joins": 0, "scans": 0}
)


def _source(spark):
    rows = [
        (1, "join merge hash pipeline"),  # joins strict+loose
        (2, "scan scan scan"),  # scans loose only -> deleted, not refiltered
        (3, "scan table filter plan"),  # scans strict -> refiltered AND deleted
        (4, "nothing relevant here"),  # untouched
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    # stored legacy category string = the LOOSE categorization, the
    # stand-in for what a previous (buggier) filter run wrote
    return d.withColumn("categories", legacy_category_string(F.col("text"), LOOSE))


def test_refilter_records_recomputes_and_encodes(spark):
    out = {r["doc_id"]: r["categories"] for r in refilter_records(_source(spark), config=CFG).collect()}
    assert out == {1: "{'joins'}", 3: "{'scans'}"}  # doc 2 fails strict


def test_split_source_for_delete_uses_stored_string(spark):
    to_del, remaining = split_source_for_delete(_source(spark), "categories", ["scans"])
    assert sorted(r["doc_id"] for r in to_del.collect()) == [2, 3]
    assert sorted(r["doc_id"] for r in remaining.collect()) == [1, 4]


def test_refilter_job_end_to_end(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    store.write("wetrecord", _source(spark), 1, coalesce=1)
    stats = refilter_job(store, "wetrecord", config=CFG, delete_categories=["scans"], coalesce=1)
    assert stats == {"version": 2, "refiltered": 2, "source_rows": 2}
    assert sorted(
        r["doc_id"] for r in store.read("wetrecord_refiltered").collect()
    ) == [1, 3]
    idx = {r["doc_id"]: r["categories"] for r in store.read("wetrecord_index_refiltered").collect()}
    assert idx == {1: "{'joins'}", 3: "{'scans'}"}
    assert sorted(r["doc_id"] for r in store.read("wetrecord").collect()) == [1, 4]


def test_source_delete_is_atomic_across_crash_and_resume(spark, tmp_path):
    """Crash between target publishes and the source publish: readers must
    still see the FULL source (never a partial delete), and a re-run must
    converge to the correct final state (the write/publish split's whole
    point — Cassandra's row-at-a-time deleteFromCassandra can't do this)."""
    store = SnapshotStore(spark, str(tmp_path))
    src = _source(spark)
    store.write("wetrecord", src, 1, coalesce=1)

    # replay refilter_job up to (but not including) the source publish
    read_src = store.read("wetrecord")
    refiltered = refilter_records(read_src, config=CFG)
    _, remaining = split_source_for_delete(read_src, "categories", ["scans"])
    store.write_unpublished(refiltered, "wetrecord_refiltered", 2, 1)
    store.write_unpublished(remaining, "wetrecord", 2, 1)
    store.publish("wetrecord_refiltered", 2)
    # -- crash here: source v2 written but never published --

    assert sorted(r["doc_id"] for r in store.read("wetrecord").collect()) == [
        1, 2, 3, 4,
    ]  # no partial delete visible
    assert store.latest_version("wetrecord") == 1

    # resume: rerun the whole job; it recomputes version 2 from source v1
    stats = refilter_job(store, "wetrecord", config=CFG, delete_categories=["scans"], coalesce=1)
    assert stats["version"] == 2
    assert sorted(r["doc_id"] for r in store.read("wetrecord").collect()) == [1, 4]
    assert sorted(
        r["doc_id"] for r in store.read("wetrecord_refiltered").collect()
    ) == [1, 3]
