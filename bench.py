"""Benchmark harness — run headline queries + one crawl round at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Headline metric (BASELINE.json): frontier URLs scheduled + fetched docs
per second on a synthetic seed frontier (deterministic generator,
in-memory round — state-store IO excluded so the number measures the
engine, not the sandbox disk). Scaling evidence (local[8] vs local[32])
lives in bench/scaling.py → BENCH.md.

Measurement protocol (r4, VERDICT r3 #4): this box has documented
up-to-3× bursty external interference, so every headline query runs
$SPARK_GRAFT_BENCH_TRIALS (default 2) full interleaved passes and
reports its MINIMUM wall; `spark.catalog.clearCache()` runs between
passes so queries that persist() intermediates re-earn their time (the
min measures interference-free cold-plan execution on a warm JVM, never
a cache hit). Consequence vs r2/r3 numbers: the first query no longer
absorbs JVM warm-up (r3's q1 5.3 s ≈ 0.5 s of work + warm-up).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from commoncrawlscalatools_spark import get_spark  # noqa: E402
from commoncrawlscalatools_spark.operators.frontier import (  # noqa: E402
    as_frontier_rows,
    canonicalize_seeds,
    schedule_round,
)
from commoncrawlscalatools_spark.operators.robots import (  # noqa: E402
    generate_robots,
    host_delays,
)
from commoncrawlscalatools_spark.queries import all_queries  # noqa: E402
from commoncrawlscalatools_spark.sources.fetch import fetch_and_extract  # noqa: E402
from commoncrawlscalatools_spark.sources.seeds import generate_seeds  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "nation_revenue",
    "top_orders_per_customer",
    "stream_filter_docs",
    "topic_filter_docs",
    "relevance_topk",
    "relevance_bm25_topk",
    "minhash_dedup_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_lsh_topk_bucketed",
    "ann_ivf_topk",
    "knn_join_lsh_topk",
    "knn_join_lsh_topk_bucketed",
    "create_corpus_pipeline",
    "refilter_pipeline",
    "minhash_cc_components",
    "dup_span_stats",
    "repetition_scores",
    "quality_gate_docs",
    "doc_fingerprints",
    "sessionize_events",
    "windowed_event_agg",
    "url_canonicalize",
    "frontier_schedule",
    "frontier_retries",
    # r5 second wave (LLM-pipeline extensions)
    "pii_redaction",
    "decontaminate_docs",
    "line_dedup_docs",
    "pack_sequences_chunks",
    "lm_perplexity_scores",
    "training_data_pipeline",
    # r6 reference-job twins (classifier over the report store; the
    # composed filter-evaluation job over the WET fixture archives)
    "classifier_statistics",
    "evaluate_topic_filter_stats",
]


def engine_round_bench(spark, n_seeds: int, n_hosts: int) -> dict:
    """Store-backed CrawlEngine round (snapshot commits on tmpfs): measures
    the full round protocol — schedule → fetch → seen/bloom/host/lineage/
    metrics/frontier commits — whose fixed costs the round-2 rework cut
    (Observation counters instead of counting actions, persisted scheduling
    window, incremental Bloom delta, frontier-last atomic marker)."""
    import shutil

    from commoncrawlscalatools_spark.operators.robots import generate_robots
    from commoncrawlscalatools_spark.plans.crawl import CrawlConfig, CrawlEngine
    from commoncrawlscalatools_spark.sources.seeds import generate_seeds

    store = "/dev/shm/spark-graft-bench-store"
    shutil.rmtree(store, ignore_errors=True)
    eng = CrawlEngine(
        spark,
        store,
        CrawlConfig(per_host_cap=1000, n_hosts=n_hosts, bloom_buckets=64),
    )
    eng.bootstrap(
        generate_seeds(spark, n_seeds, seed=42, n_hosts=n_hosts),
        generate_robots(spark, n_hosts, seed=42),
    )
    metrics = eng.run(2)
    shutil.rmtree(store, ignore_errors=True)
    r2 = metrics[-1]
    return {
        "rounds": len(metrics),
        "round2_wall_s": r2["wall_s"],
        "round2_docs": r2["fetched_docs"],
        "round2_docs_per_s": r2["docs_per_s"],
        # full-round wall INCLUDING metrics + frontier-marker commits —
        # the honest end-to-end number (wall_s keeps the r1/r2 pre-marker
        # window for cross-round comparability)
        "round2_full_wall_s": r2["full_wall_s"],
        "round2_full_docs_per_s": r2["full_docs_per_s"],
        "round2_phase_ms": r2["phase_ms"],
        "total_docs": sum(m["fetched_docs"] for m in metrics),
        "total_wall_s": round(sum(m["wall_s"] for m in metrics), 3),
    }


def crawl_round_bench(spark, n_seeds: int, n_hosts: int, per_host_cap: int) -> dict:
    seeds = generate_seeds(spark, n_seeds, seed=42, n_hosts=n_hosts)
    robots = generate_robots(spark, n_hosts, seed=42)
    t0 = time.time()
    frontier = as_frontier_rows(canonicalize_seeds(seeds), 0)
    sched = schedule_round(
        frontier, None, host_delays(robots), 1, per_host_cap=per_host_cap
    )
    docs = fetch_and_extract(sched, n_hosts=n_hosts)
    agg = docs.agg(
        F.count("*").alias("docs"),
        F.sum(F.size("spans")).alias("spans"),
        F.sum(F.size("outlinks")).alias("links"),
    ).collect()[0]
    wall = time.time() - t0
    n_docs = int(agg["docs"])
    return {
        "wall_s": round(wall, 3),
        "scheduled": n_docs,
        "docs": n_docs,
        "spans": int(agg["spans"] or 0),
        "outlinks": int(agg["links"] or 0),
        "throughput": round(2 * n_docs / wall, 1),  # scheduled URLs + fetched docs
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_seeds = int(os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "300000"))
    spark = get_spark(cores=cpus, shuffle_partitions=cpus)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    # ANN index build is its own measured phase (VERDICT r3 #5): built
    # once per sf_dir, so the ann_lsh_topk_bucketed entry below times the
    # pure probe-partition scan — the shape a deployed index has.
    from commoncrawlscalatools_spark.queries import (
        ensure_ann_bucketed_index,
        ensure_knn_corpus_index,
    )

    t0 = time.time()
    ensure_ann_bucketed_index(spark, sf_dir, force=True)
    ann_build_s = round(time.time() - t0, 3)
    t0 = time.time()
    ensure_knn_corpus_index(spark, sf_dir, force=True)
    knn_build_s = round(time.time() - t0, 3)

    # Interleaved min-wall trials (VERDICT r3 #4): this box has documented
    # up-to-3× bursty external interference (BENCH.md), so each query runs
    # `trials` full passes apart in time and reports its minimum wall —
    # the interference-floor protocol bench/scaling.py already uses.
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))
    queries = all_queries()
    per_query: dict[str, float] = {}
    for _ in range(trials):
        # drop plan-level cache between passes: queries that persist()
        # intermediates must re-earn their time every trial (min-wall
        # measures interference-free COLD plan execution, not cache hits)
        spark.catalog.clearCache()
        for name in HEADLINE:
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            per_query[name] = min(per_query.get(name, float("inf")), dt)
    per_query["ann_bucketed_build"] = ann_build_s
    per_query["knn_corpus_build"] = knn_build_s

    # crawl throughput: one warm-up (tiny) + min-wall over measured rounds
    crawl_round_bench(spark, 10_000, 200, 20)
    crawl = min(
        (
            crawl_round_bench(spark, n_seeds, max(200, n_seeds // 500), per_host_cap=1000)
            for _ in range(trials)
        ),
        key=lambda c: c["wall_s"],
    )
    per_query["crawl_round"] = crawl["wall_s"]

    # store-backed engine round (snapshot commit protocol included)
    engine = engine_round_bench(spark, n_seeds // 3, max(200, n_seeds // 1500))
    per_query["engine_round2"] = engine["round2_wall_s"]

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "frontier URLs scheduled + fetched docs per sec (synthetic frontier, one round)",
                "value": crawl["throughput"],
                "unit": "docs/sec",
                "queries": per_query,
                "sf": sf,
                "crawl": crawl,
                "engine": engine,
                "total_query_sec": total,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
