"""Extra interleaved scaling trials (same worker, same 2M-seed input) to
find per-level interference floors: the min-wall protocol needs at least
one quiet window per level, and a burst-heavy day can deny one level its
floor inside a single 4-trial sweep (r5: local[2] hit its floor in trial
0 while every local[8] wall stayed ~20% above the r4 floor). Appends one
JSON line per run; BENCH.md merges minima over ALL of the day's trials."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import run

trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_extra.jsonl"
for i in range(trials):
    for cores in (2, 8, 32):
        r = run(cores, 2_000_000)
        with open(out, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(f"extra trial {i} local[{cores}]: wall={r['wall_s']}s tput={r['throughput']}", flush=True)
