"""Snapshot-versioned table store: checkpoint/resume for crawl state.

Production target is Iceberg (one snapshot per table per round; resume =
read latest snapshot; state updates via MERGE INTO). The sandbox image has
no Iceberg jars (pyspark_guide.md), so this module provides the same
contract over parquet: each commit writes `<root>/<table>/v=<n>/` then
atomically publishes it in `<root>/<table>/_manifest.json` (temp file +
os.replace). A crash between write and publish leaves the previous
snapshot current — the same all-or-nothing semantics an Iceberg commit
gives. Reference analog: wetpaths started/finished state survives job
death and work is reclaimed (GetWETPaths.scala:15-31, SURVEY.md W2).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_manifest.json")

    def _read_manifest(self, table: str) -> dict:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return {"versions": []}
        with open(path) as f:
            return json.load(f)

    def versions(self, table: str) -> list[int]:
        return self._read_manifest(table)["versions"]

    def latest_version(self, table: str) -> int | None:
        v = self.versions(table)
        return v[-1] if v else None

    def write(
        self,
        table: str,
        df: DataFrame,
        version: int,
        coalesce: int | None = None,
        partition_by: list[str] | None = None,
        append: bool = False,
    ) -> None:
        """Write snapshot `version`; publish atomically. Small state tables
        are coalesced to avoid the small-files tax that kills fixed-cost
        scaling efficiency (SURVEY.md §7.4). `partition_by` maps to hive
        partitioning (Iceberg partition spec stand-in) so downstream state
        predicates prune at the file level.

        `append=True` declares the table APPEND-MODE (Iceberg append
        snapshot stand-in): each version holds only that round's DELTA
        rows, and `read(table, v)` returns the union of all published
        versions ≤ v. This is what keeps a monotone-growing table (the
        URL-seen set) at O(new rows) write cost per round instead of an
        O(|table|) rewrite — at 10^10 seen URLs a per-round rewrite is the
        scale killer. Re-running a round overwrites its own delta only
        (idempotent resume); `compact()` is the Iceberg
        `rewrite_data_files` maintenance analog that bounds read-side
        path count as rounds accumulate."""
        self.write_unpublished(df, table, version, coalesce, partition_by)
        self.publish(table, version, append=append)

    def write_unpublished(
        self,
        df: DataFrame,
        table: str,
        version: int,
        coalesce: int | None = None,
        partition_by: list[str] | None = None,
    ) -> None:
        """Write the data files WITHOUT publishing the version. Invisible
        to `read` until `publish` runs — lets a caller overlap the (big)
        data write with other work and place the atomic manifest update
        exactly at its commit point (the crawl round writes the frontier
        parquet concurrently with filter maintenance, then publishes it as
        the round marker only after every side commit has landed)."""
        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        path = os.path.join(tdir, f"v={version}")
        if coalesce:
            df = df.coalesce(coalesce)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def publish(self, table: str, version: int, append: bool = False) -> None:
        """Atomically publish a previously written version (temp file +
        os.replace — the Iceberg metadata-swap analog)."""
        tdir = os.path.join(self.root, table)
        manifest = self._read_manifest(table)
        base = manifest.get("base")
        if base is not None and version <= base:
            raise ValueError(
                f"table {table} v={version} is already folded into the "
                f"compacted base (base={base}); compacted history is immutable"
            )
        if version not in manifest["versions"]:
            manifest["versions"] = sorted(set(manifest["versions"]) | {version})
        if append:
            manifest["append"] = True
        self._write_manifest(table, manifest)

    def _write_manifest(self, table: str, manifest: dict) -> None:
        tdir = os.path.join(self.root, table)
        fd, tmp = tempfile.mkstemp(dir=tdir)
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))

    def compact(
        self, table: str, upto_version: int | None = None, vacuum: bool = True
    ) -> int | None:
        """Rewrite the union of an append-mode table's published deltas
        ≤ `upto_version` into ONE base directory and atomically re-publish
        it as the new read base — the Iceberg `rewrite_data_files` analog
        the append-mode design needs: without it every read opens one
        parquet path per crawl round, so resume latency and scan-planning
        cost grow linearly with crawl age (reference analog: Cassandra
        compacts its SSTables itself; a snapshot store must do it
        explicitly). Crash-safe: the base is written to a staging dir,
        renamed, then the manifest swap publishes it — a kill at any point
        leaves the previous base + deltas current and readable. With
        `vacuum` the folded delta dirs (and the previous base) are removed
        AFTER the swap; reads of versions below the new base then raise
        (Iceberg snapshot expiration). Returns the new base version, or
        None when there was nothing to fold."""
        tdir = os.path.join(self.root, table)
        manifest = self._read_manifest(table)
        if not manifest.get("append"):
            raise ValueError(f"table {table} is not append-mode; nothing to compact")
        published = manifest["versions"]
        if not published:
            return None
        v = published[-1] if upto_version is None else upto_version
        if v not in published:
            raise FileNotFoundError(f"table {table} v={v} is not published")
        old_base = manifest.get("base")
        folds = [u for u in published if (old_base is None or u > old_base) and u <= v]
        if old_base is not None and (v <= old_base or not folds):
            return None  # already covered by the current base
        df = self.read(table, v)  # current base (if any) + deltas ≤ v
        staging = os.path.join(tdir, f"base={v}.staging")
        final = os.path.join(tdir, f"base={v}")
        df.write.mode("overwrite").parquet(staging)
        if os.path.exists(final):  # interrupted earlier attempt at same v
            import shutil

            shutil.rmtree(final)
        os.rename(staging, final)
        manifest["base"] = v
        self._write_manifest(table, manifest)  # ← the commit point
        if vacuum:
            import shutil

            for u in folds:
                shutil.rmtree(os.path.join(tdir, f"v={u}"), ignore_errors=True)
            if old_base is not None:
                shutil.rmtree(
                    os.path.join(tdir, f"base={old_base}"), ignore_errors=True
                )
        return v

    def read_paths(self, table: str, version: int | None = None) -> list[str]:
        """The parquet directories a `read` at `version` opens — the
        observable that compaction bounds (tests/bench assert its size
        stays O(1) in round count once compaction runs)."""
        manifest = self._read_manifest(table)
        published = manifest["versions"]
        if version is None:
            if not published:
                raise FileNotFoundError(f"no committed snapshot for table {table}")
            v = published[-1]
        else:
            if version not in published:
                raise FileNotFoundError(
                    f"table {table} v={version} is not a published snapshot "
                    f"(published: {published})"
                )
            v = version
        if not manifest.get("append"):
            return [os.path.join(self.root, table, f"v={v}")]
        base = manifest.get("base")
        if base is not None and v < base:
            raise FileNotFoundError(
                f"table {table} v={v} predates the compacted base "
                f"(base={base}): snapshot expired by compaction"
            )
        paths = []
        if base is not None:
            paths.append(os.path.join(self.root, table, f"base={base}"))
        paths += [
            os.path.join(self.root, table, f"v={u}")
            for u in published
            if (base is None or u > base) and u <= v
        ]
        return paths

    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Read a PUBLISHED snapshot. An explicit version must appear in the
        manifest — a directory written but never published (kill mid-round)
        is invisible, preserving all-or-nothing round semantics. For an
        append-mode table the result is the union of the compacted base
        (if any) plus all published deltas above it up to `version` —
        one multi-path parquet scan whose path count `compact()` keeps
        bounded."""
        reader = self.spark.read
        if self._read_manifest(table).get("append"):
            # an append-mode table's history can span code versions that
            # added columns (e.g. metrics gained phase_*_ms fields):
            # without mergeSchema the multi-path scan takes the FIRST
            # file's schema and silently nulls-or-drops newer columns
            # (ADVICE r4 #3). Old deltas surface the new columns as NULL.
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*self.read_paths(table, version))

    def exists(self, table: str) -> bool:
        return self.latest_version(table) is not None
