"""Worker for the N-vs-4N scaling benchmark: run the crawl round pipeline
at a given core count, print one JSON line. Invoked as a subprocess so each
parallelism level gets a clean JVM (the sandbox stand-in for two cluster
sizes — BASELINE.md scaling criterion)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commoncrawlscalatools_spark import get_spark  # noqa: E402


def main():
    cores = int(sys.argv[1])
    n_seeds = int(sys.argv[2])
    n_hosts = max(200, n_seeds // 500)
    spark = get_spark(app=f"scaling_{cores}", cores=cores, shuffle_partitions=cores)
    from bench import crawl_round_bench

    # Warm-up at the SAME size: compiles the identical generated code and
    # spins up the python workers, so the measured run reflects steady-state
    # throughput (what a long crawl does), not one-time JIT/plan costs.
    crawl_round_bench(spark, n_seeds, n_hosts, per_host_cap=1000)
    result = crawl_round_bench(spark, n_seeds, n_hosts, per_host_cap=1000)
    result["cores"] = cores
    result["n_seeds"] = n_seeds
    print(json.dumps(result))


if __name__ == "__main__":
    main()
