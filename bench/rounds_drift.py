"""Per-round wall drift over a long store-backed crawl (VERDICT r3 #9 —
the acceptance measurement for delta compaction, r3 #1): run K store-backed
rounds at a FIXED per-round budget (constant work per round while the
append-mode seen/frontier_log tables grow with crawl age) and report the
per-round full wall, the read-side parquet path counts, and the drift
between the early and late round windows. Without compaction every read
of `seen` opens one path per round, so late rounds slow linearly; with
`compact_every` the path count and wall stay flat.

Run: python bench/rounds_drift.py [rounds] [budget] [compact_every|none]
Prints one JSON line; numbers land in BENCH.md §Round drift.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commoncrawlscalatools_spark import get_spark  # noqa: E402
from commoncrawlscalatools_spark.operators.robots import generate_robots  # noqa: E402
from commoncrawlscalatools_spark.plans.crawl import CrawlConfig, CrawlEngine  # noqa: E402
from commoncrawlscalatools_spark.sources.seeds import generate_seeds  # noqa: E402


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    compact_arg = sys.argv[3] if len(sys.argv) > 3 else "8"
    compact_every = None if compact_arg == "none" else int(compact_arg)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark(app="rounds_drift", cores=cpus, shuffle_partitions=cpus)
    store = "/dev/shm/spark-graft-drift-store"
    shutil.rmtree(store, ignore_errors=True)
    cfg = CrawlConfig(
        per_host_cap=1000,
        budget=budget,
        n_hosts=500,
        bloom_buckets=64,
        compact_every=compact_every,
        doc_coalesce=8,
    )
    eng = CrawlEngine(spark, store, cfg)
    eng.bootstrap(
        generate_seeds(spark, budget * 12, seed=42, n_hosts=500),
        generate_robots(spark, 500, seed=42),
    )
    metrics = eng.run(rounds)
    walls = [m["full_wall_s"] for m in metrics]
    paths = [len(eng.store.read_paths(t)) for t in ("seen", "frontier_log")]

    # drift: late-window mean vs early-window mean (skip the first 3
    # JVM/plan warm-up rounds)
    early = walls[3:8]
    late = walls[-5:]
    drift = (sum(late) / len(late)) / (sum(early) / len(early)) - 1.0
    shutil.rmtree(store, ignore_errors=True)
    print(
        json.dumps(
            {
                "rounds": len(metrics),
                "budget": budget,
                "compact_every": compact_every,
                "walls_s": walls,
                "early_mean_s": round(sum(early) / len(early), 3),
                "late_mean_s": round(sum(late) / len(late), 3),
                "drift_pct": round(drift * 100, 1),
                "final_read_paths": {"seen": paths[0], "frontier_log": paths[1]},
                "total_docs": sum(m["fetched_docs"] for m in metrics),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
