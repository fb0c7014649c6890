"""The crawl round loop — the engine's flagship plan.

Reference analog: parseWETFilesFromCommoncrawl.main (SURVEY.md §3.1) — the
batch-with-resume ingest loop — rebuilt as deterministic micro-rounds over
snapshot tables:

  round r:
    frontier(pending) ──schedule──▶ scheduled (politeness + priority + budget)
    scheduled ──fetch+extract──▶ documents (spans) + outlinks
    outlinks ──canonicalize──▶ robots filter ──▶ Bloom+exact URL-seen ──▶
        new pending frontier rows
    commit snapshots: frontier, seen, host_state, documents, metrics

Every round commits one snapshot per table (checkpoint); `CrawlEngine.run`
resumes from the latest committed round after a kill (reference W2 work
reclaim). Lineage: per-partition row counts from the fetch stage land in
the metrics table (reference W5 triggers → data, not side-channel RPC).

Scale notes: within a round the only wide operations are (1) the host
window in scheduling, (2) the seen anti-join on url_hash, (3) the
dedup groupBy of new candidates. All are keyed on high-cardinality
hash-distributed keys; per-host skew is bounded by per_host_cap before
anything global. Fixed per-round overhead (snapshot commit) is amortized
by round size — see bench/scaling.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators import frontier as FR
from commoncrawlscalatools_spark.operators import robots as RB
from commoncrawlscalatools_spark.operators import seen as SN
from commoncrawlscalatools_spark.plans.state import SnapshotStore
from commoncrawlscalatools_spark.sources import fetch as FE


@dataclass
class CrawlConfig:
    per_host_cap: int = 10
    budget: int | None = None
    n_hosts: int = 1000
    bloom_buckets: int = 64
    use_bloom: bool = True
    shuffle_partitions: int | None = None
    doc_coalesce: int | None = None  # coalesce docs before write (small rounds)
    # W6 slow-kill (reference: ParserTooSlowException + min-throughput kill,
    # Parser.scala:92-176, ProcessWETPaths.scala:77-95): abort the loop when
    # a round's docs/s drops below the floor; state is committed, so a
    # resume retries from the completed round.
    min_docs_per_s: float | None = None


class CrawlEngine:
    def __init__(self, spark: SparkSession, store_root: str, config: CrawlConfig | None = None):
        self.spark = spark
        self.store = SnapshotStore(spark, store_root)
        self.config = config or CrawlConfig()

    # -- bootstrap -------------------------------------------------------

    def bootstrap(self, seeds: DataFrame, robots: DataFrame) -> None:
        """Round 0 state: canonicalized deduped seeds as pending frontier."""
        cand = FR.canonicalize_seeds(seeds)
        frontier0 = FR.as_frontier_rows(cand, round_no=0)
        self.store.write("frontier", frontier0, 0)
        self.store.write(
            "seen",
            frontier0.select("url_hash", F.lit(0).cast("int").alias("round_added")),
            0,
        )
        self.store.write(
            "host_state",
            frontier0.select("host").distinct().withColumn(
                "host_ready_ms", F.lit(0).cast("long")
            ),
            0,
            coalesce=4,
        )
        self.store.write("robots", robots, 0, coalesce=4)

    def latest_round(self) -> int:
        v = self.store.latest_version("frontier")
        return v if v is not None else -1

    # -- one round -------------------------------------------------------

    def run_round(self, round_no: int) -> dict:
        t0 = time.time()
        cfg = self.config
        frontier = self.store.read("frontier", round_no - 1)
        host_state = self.store.read("host_state", round_no - 1)
        seen = self.store.read("seen", round_no - 1)
        robots = self.store.read("robots", 0)

        scheduled = FR.schedule_round(
            frontier,
            host_state,
            RB.host_delays(robots),
            round_no,
            per_host_cap=cfg.per_host_cap,
            budget=cfg.budget,
            shuffle_partitions=cfg.shuffle_partitions,
        )
        docs = FE.fetch_and_extract(scheduled, n_hosts=cfg.n_hosts)
        self.store.write("documents", docs, round_no, coalesce=cfg.doc_coalesce)
        docs = self.store.read("documents", round_no)  # re-read: one fetch pass

        n_docs = docs.count()
        n_spans, n_links = 0, 0
        if n_docs:
            agg = docs.agg(
                F.sum(F.size("spans")).alias("s"), F.sum(F.size("outlinks")).alias("l")
            ).collect()[0]
            n_spans, n_links = int(agg["s"] or 0), int(agg["l"] or 0)

        # per-partition lineage (reference W5 triggers → rows, not RPC)
        lineage = (
            docs.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("docs"), F.sum(F.size("outlinks")).alias("outlinks"))
            .withColumn("round", F.lit(round_no))
        )

        # outlink feedback: canonicalize → robots → unseen → new frontier rows
        outlinks = docs.select(F.explode("outlinks").alias("url"))
        cand = FR.canonicalize_seeds(
            outlinks.withColumn("priority", F.lit(0.5))
        )
        cand = RB.apply_robots(cand, robots)
        bloom = (
            SN.build_bloom(seen, n_buckets=cfg.bloom_buckets) if cfg.use_bloom else None
        )
        new_urls = SN.filter_unseen(
            cand, seen, bloom_state=bloom, n_buckets=cfg.bloom_buckets
        )
        new_frontier_rows = FR.as_frontier_rows(new_urls, round_no)

        # state transitions + snapshot commits
        frontier_next = FR.mark_fetched(frontier, scheduled, round_no).unionByName(
            new_frontier_rows
        )
        self.store.write("frontier", frontier_next, round_no)
        seen_next = seen.unionByName(
            new_frontier_rows.select(
                "url_hash", F.lit(round_no).cast("int").alias("round_added")
            )
        )
        self.store.write("seen", seen_next, round_no)
        # host_state upsert: scheduled hosts advance, others keep prev value
        adv = FR.advance_host_state(scheduled)
        host_state_next = (
            host_state.withColumnRenamed("host_ready_ms", "prev_ready")
            .join(adv, "host", "full_outer")
            .select(
                "host",
                F.coalesce(F.col("host_ready_ms"), F.col("prev_ready")).alias(
                    "host_ready_ms"
                ),
            )
        )
        self.store.write("host_state", host_state_next, round_no, coalesce=4)
        self.store.write("lineage", lineage, round_no, coalesce=1)

        n_scheduled = scheduled.count()
        n_new = new_frontier_rows.count()
        wall = time.time() - t0
        metrics = {
            "round": round_no,
            "scheduled": n_scheduled,
            "fetched_docs": n_docs,
            "spans": n_spans,
            "outlinks": n_links,
            "new_urls": n_new,
            "wall_s": round(wall, 3),
            "docs_per_s": round(n_docs / wall, 1) if wall > 0 else 0.0,
        }
        metrics["slow"] = bool(
            self.config.min_docs_per_s is not None
            and metrics["docs_per_s"] < self.config.min_docs_per_s
        )
        self.store.write(
            "metrics",
            self.spark.createDataFrame([metrics]),
            round_no,
            coalesce=1,
        )
        return metrics

    # -- loop with resume --------------------------------------------------

    def run(self, rounds: int) -> list[dict]:
        """Run up to `rounds` rounds total, resuming after the latest
        committed round (kill-and-resume = re-invoke run)."""
        done = self.latest_round()
        out = []
        for r in range(done + 1, rounds + 1):
            m = self.run_round(r)
            out.append(m)
            if m.get("slow"):
                # W6: stop the loop; the committed snapshot makes the retry
                # point explicit (reference killed the parser task and
                # requeued the path)
                break
        return out
