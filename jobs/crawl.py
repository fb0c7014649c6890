"""spark-submit entrypoint for the crawl engine (north rule: the job ships
via ``spark-submit --py-files``).

Usage:
    # package the engine, then submit (any cluster master works; the round
    # loop is driver-side, all heavy work is DataFrame jobs):
    cd /root/repo && zip -qr /tmp/ccst_spark.zip commoncrawlscalatools_spark
    spark-submit --py-files /tmp/ccst_spark.zip jobs/crawl.py \
        --state-dir /tmp/crawlstate --seeds 100000 --hosts 2000 \
        --rounds 3 --per-host-cap 10 [--budget N] [--resume]

Resume: re-running with the same --state-dir continues after the last
committed round (snapshot manifests are the checkpoint — plans/state.py).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description="crawl round-loop driver")
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--seeds", type=int, default=100_000)
    ap.add_argument("--hosts", type=int, default=2_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--per-host-cap", type=int, default=10)
    ap.add_argument("--budget", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--fail-permille", type=int, default=0,
                    help="deterministic synthetic fetch-failure rate (retry path)")
    ap.add_argument("--max-retries", type=int, default=3)
    ap.add_argument("--resume", action="store_true", help="continue from the last committed round (default behavior if state exists)")
    args = ap.parse_args()

    from commoncrawlscalatools_spark import get_spark
    from commoncrawlscalatools_spark.operators.robots import generate_robots
    from commoncrawlscalatools_spark.plans.crawl import CrawlConfig, CrawlEngine
    from commoncrawlscalatools_spark.sources.seeds import generate_seeds

    spark = get_spark(app="crawl")
    cfg = CrawlConfig(
        per_host_cap=args.per_host_cap,
        budget=args.budget,
        n_hosts=args.hosts,
        fail_permille=args.fail_permille,
        max_retries=args.max_retries,
    )
    engine = CrawlEngine(spark, args.state_dir, cfg)
    if engine.latest_round() < 0:
        engine.bootstrap(
            generate_seeds(spark, args.seeds, seed=args.seed, n_hosts=args.hosts),
            generate_robots(spark, args.hosts, seed=args.seed),
        )
    elif not args.resume:
        print(f"state exists at {args.state_dir} (round {engine.latest_round()}); resuming")
    for m in engine.run(args.rounds):
        print(json.dumps(m))


if __name__ == "__main__":
    main()
