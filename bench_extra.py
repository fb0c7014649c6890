"""Targeted per-query benchmark + plan capture (guide §1.4 noop-sink
isolation). bench.py is FROZEN for driver measurement; this file exists so
optimization work can time individual queries at any scale factor and dump
`.explain("formatted")` plans without touching the frozen harness.

Usage:
  python bench_extra.py [--sf DIR] [--trials N] [--plans OUTDIR] q1 q2 ...
  python bench_extra.py --sf /root/testdata/sf1.0 repetition_scores

Prints one JSON line: {"queries": {name: min_sec}, "sf_dir": ..., "trials": N}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from commoncrawlscalatools_spark import get_spark  # noqa: E402
from commoncrawlscalatools_spark.queries import all_queries  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans", default=None, help="directory to write <name>.txt formatted plans")
    ap.add_argument("--suffix", default="", help="suffix for plan filenames (e.g. _before)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cpus, shuffle_partitions=cpus)
    queries = all_queries()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in args.names:
            df = queries[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()

    per: dict[str, float] = {}
    for _ in range(args.trials):
        spark.catalog.clearCache()
        for name in args.names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = queries[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            per[name] = min(per.get(name, float("inf")), dt)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": per, "sf_dir": args.sf, "trials": args.trials}))


if __name__ == "__main__":
    main()
