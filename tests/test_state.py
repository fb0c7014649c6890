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


def test_compact_preserves_reads_and_bounds_paths(spark, tmp_path):
    """Delta compaction (Iceberg rewrite_data_files analog): folding all
    published deltas into one base must leave read() byte-identical, drop
    the read-side path count to 1, keep later deltas appendable, and make
    pre-base versions unreadable (snapshot expiration)."""
    import pytest

    store = SnapshotStore(spark, str(tmp_path / "stc"))
    for v in range(10):
        store.write("seen", _hashes(spark, v * 5, v * 5 + 5), v, append=True)
    before = sorted(r["url_hash"] for r in store.read("seen").collect())
    assert len(store.read_paths("seen")) == 10

    assert store.compact("seen") == 9
    assert len(store.read_paths("seen")) == 1
    after = sorted(r["url_hash"] for r in store.read("seen").collect())
    assert after == before

    # later deltas stack on the base; a second compaction folds them in
    store.write("seen", _hashes(spark, 50, 55), 10, append=True)
    store.write("seen", _hashes(spark, 55, 60), 11, append=True)
    assert len(store.read_paths("seen")) == 3
    assert sorted(r["url_hash"] for r in store.read("seen").collect()) == list(range(60))
    assert store.compact("seen") == 11
    assert len(store.read_paths("seen")) == 1
    assert sorted(r["url_hash"] for r in store.read("seen").collect()) == list(range(60))

    # versions below the base are expired; re-publishing into compacted
    # history is refused (the base is immutable)
    with pytest.raises(FileNotFoundError):
        store.read("seen", 3)
    with pytest.raises(ValueError):
        store.publish("seen", 5)
    # compacting again with nothing new is a no-op
    assert store.compact("seen") is None


def test_compact_partial_prefix_and_crash_leftovers(spark, tmp_path):
    """Compaction up to an intermediate version keeps later deltas live;
    a leftover final dir from a killed earlier attempt is replaced, and a
    kill before the manifest swap leaves the previous view intact."""
    import os

    root = str(tmp_path / "stp")
    store = SnapshotStore(spark, root)
    for v in range(6):
        store.write("seen", _hashes(spark, v * 3, v * 3 + 3), v, append=True)
    # leftover from a crashed attempt: final dir exists, manifest never swapped
    _hashes(spark, 0, 1).write.parquet(os.path.join(root, "seen", "base=3"))
    assert len(store.read_paths("seen")) == 6  # manifest rules; leftover invisible

    assert store.compact("seen", upto_version=3) == 3
    assert len(store.read_paths("seen")) == 3  # base + deltas 4,5
    assert sorted(r["url_hash"] for r in store.read("seen").collect()) == list(range(18))
    # time travel to a post-base version still works
    assert store.read("seen", 4).count() == 15


def test_non_append_tables_keep_full_snapshot_semantics(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "st3"))
    store.write("frontier", _hashes(spark, 0, 3), 0)
    store.write("frontier", _hashes(spark, 0, 7), 1)
    assert store.read("frontier", 0).count() == 3
    assert store.read("frontier", 1).count() == 7
    assert store.read("frontier").count() == 7


def test_append_mode_mixed_schema_history_merges(spark, tmp_path):
    """A code upgrade that adds columns to an append-mode table (metrics
    gained phase_*_ms fields in r4) must not silently drop them when the
    history mixes old- and new-schema deltas (ADVICE r4 #3): reads merge
    schemas, old rows surface the new column as NULL."""
    from pyspark.sql import functions as F

    store = SnapshotStore(spark, str(tmp_path / "st"))
    old = spark.range(1).select(F.lit(1).alias("round"), F.lit(10).alias("docs"))
    new = spark.range(1).select(
        F.lit(2).alias("round"), F.lit(20).alias("docs"),
        F.lit(123).alias("phase_fetch_ms"),
    )
    store.write("metrics", old, 1, coalesce=1, append=True)
    store.write("metrics", new, 2, coalesce=1, append=True)
    got = store.read("metrics")
    assert "phase_fetch_ms" in got.columns
    rows = {r["round"]: r for r in got.collect()}
    assert rows[1]["phase_fetch_ms"] is None
    assert rows[2]["phase_fetch_ms"] == 123
