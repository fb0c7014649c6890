"""Quiet-window hunter for an arbitrary (lo, hi) scaling pair.

Generalizes bench/window_hunter.py: polls 1-min load, and inside each
quiet window runs ONE fresh-JVM interleaved (lo, hi) trial pair of the
byte-identical scaling job, appending every wall to a JSON log — nothing
is dropped. Within-window pairs are the methodologically sound scaling
comparison on this interference-prone box (BENCH.md): cross-window floor
pairing mixes windows of different quality and biases the ratio in
whichever direction the quieter window's level happens to land.

Usage: python bench/pair_hunter.py LO HI [minutes] [max_trials] [target]
Stops early once a within-window pair reaches raw efficiency >= target.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "scaling", os.path.join(REPO, "bench", "scaling.py")
)
_scaling = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_scaling)


def load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    lo, hi = int(sys.argv[1]), int(sys.argv[2])
    budget_min = float(sys.argv[3]) if len(sys.argv) > 3 else 120
    max_trials = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    target = float(sys.argv[5]) if len(sys.argv) > 5 else 0.80
    max_load = float(os.environ.get("HUNTER_MAX_LOAD", "1.5"))
    n_seeds = int(os.environ.get("SPARK_GRAFT_SCALE_SEEDS", "2000000"))
    out = f"/tmp/pair_hunter_{lo}_{hi}.json"
    ideal = hi / lo
    deadline = time.time() + budget_min * 60
    walls: dict[str, list] = {str(lo): [], str(hi): [], "load_at_launch": [],
                              "pair_raw": []}
    trials = 0
    while time.time() < deadline and trials < max_trials:
        l1 = load1()
        if l1 >= max_load:
            time.sleep(60)
            continue
        print(f"window open (load {l1}); trial {trials}", flush=True)
        walls["load_at_launch"].append(l1)
        pair = {}
        for c in (lo, hi):
            r = _scaling.run(c, n_seeds)
            pair[c] = r["wall_s"]
            walls[str(c)].append(r["wall_s"])
            print(f"  local[{c}]: wall={r['wall_s']}s tput={r['throughput']}",
                  flush=True)
        raw = round((pair[lo] / pair[hi]) / ideal, 3)
        walls["pair_raw"].append(raw)
        print(f"  within-window pair raw = {raw}", flush=True)
        trials += 1
        with open(out, "w") as f:
            json.dump(walls, f, indent=1)
        if raw >= target:
            print(f"target {target} met — stopping", flush=True)
            break
    print(f"done: {trials} trials -> {out}", flush=True)


if __name__ == "__main__":
    main()
