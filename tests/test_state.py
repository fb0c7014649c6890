"""SnapshotStore append-mode (Iceberg append-snapshot stand-in): a
version holds only its round's delta; read(v) is the union of published
deltas ≤ v; re-running a round overwrites only its own delta (idempotent
resume); unpublished directories stay invisible."""

import os

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.plans.state import SnapshotStore


def _hashes(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("url_hash"))


def test_append_mode_union_versioning_and_idempotent_overwrite(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "st"))
    store.write("seen", _hashes(spark, 0, 5), 0, append=True)
    store.write("seen", _hashes(spark, 5, 8), 1, append=True)
    store.write("seen", _hashes(spark, 8, 10), 2, append=True)
    # read(v) = union of deltas <= v — time travel over append snapshots
    assert store.read("seen", 0).count() == 5
    assert store.read("seen", 1).count() == 8
    assert store.read("seen", 2).count() == 10
    assert store.read("seen").count() == 10
    # a resume re-runs round 2 and overwrites ONLY its delta
    store.write("seen", _hashes(spark, 8, 11), 2, append=True)
    assert store.read("seen", 2).count() == 11
    assert store.read("seen", 1).count() == 8
    assert {r["url_hash"] for r in store.read("seen").collect()} == set(range(11))


def test_append_mode_unpublished_delta_invisible(spark, tmp_path):
    root = str(tmp_path / "st2")
    store = SnapshotStore(spark, root)
    store.write("seen", _hashes(spark, 0, 4), 0, append=True)
    # simulate a kill between write and publish: directory exists,
    # manifest does not list it
    _hashes(spark, 4, 9).write.parquet(os.path.join(root, "seen", "v=1"))
    assert store.read("seen").count() == 4
    try:
        store.read("seen", 1)
        raise AssertionError("unpublished version must not be readable")
    except FileNotFoundError:
        pass


def test_non_append_tables_keep_full_snapshot_semantics(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "st3"))
    store.write("frontier", _hashes(spark, 0, 3), 0)
    store.write("frontier", _hashes(spark, 0, 7), 1)
    assert store.read("frontier", 0).count() == 3
    assert store.read("frontier", 1).count() == 7
    assert store.read("frontier").count() == 7
