"""Quiet-window re-measure of the store-backed engine round (VERDICT r5
next #2): the r5 docs-write/seen-feedback overlap landed but the measured
round-2 wall (12.41 s) never beat r4's 9.53 s floor — BENCH.md attributed
the gap to same-day interference. This hunter polls 1-min load and runs
ONE fresh-JVM engine_round_bench per quiet window (same params as
bench.py's per-round run: n_seeds=100k, n_hosts=200, local[32]),
appending every wall + phase table to a JSON log; nothing is dropped.

Usage: python bench/engine_window_hunter.py [minutes] [max_trials]
Stops early once a round-2 wall <= TARGET_S (default 9.5) is recorded.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/engine_window_hunter.json"
TARGET_S = float(os.environ.get("HUNTER_TARGET_S", "9.5"))

WORKER = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
os.environ["SPARK_GRAFT_CPUS"] = "32"
from commoncrawlscalatools_spark import get_spark
import importlib.util
spec = importlib.util.spec_from_file_location("bench", os.path.join(%(repo)r, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
spark = get_spark(cores=32)
r = bench.engine_round_bench(spark, 100_000, 200)
print("ENGINE_RESULT " + json.dumps(r))
"""


def load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    budget_min = float(sys.argv[1]) if len(sys.argv) > 1 else 90
    max_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    max_load = float(os.environ.get("HUNTER_MAX_LOAD", "1.5"))
    deadline = time.time() + budget_min * 60
    results: list[dict] = []
    trials = 0
    while time.time() < deadline and trials < max_trials:
        l1 = load1()
        if l1 >= max_load:
            time.sleep(60)
            continue
        print(f"window open (load {l1}); trial {trials}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, "-c", WORKER % {"repo": REPO}],
                capture_output=True, text=True, timeout=420,
            ).stdout
        except subprocess.TimeoutExpired:
            print("  trial wedged (420 s bound) — skipped", flush=True)
            trials += 1
            continue
        rec = None
        for line in out.splitlines():
            if line.startswith("ENGINE_RESULT "):
                rec = json.loads(line[len("ENGINE_RESULT "):])
        if rec is None:
            print("  trial produced no result line", flush=True)
            trials += 1
            continue
        rec["load_at_launch"] = l1
        results.append(rec)
        trials += 1
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(
            f"  round2_wall_s={rec['round2_wall_s']} "
            f"full={rec['round2_full_wall_s']} phases={rec['round2_phase_ms']}",
            flush=True,
        )
        if rec["round2_wall_s"] <= TARGET_S:
            print(f"target {TARGET_S} s met — stopping", flush=True)
            break
    print(f"done: {len(results)} measured trials -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
