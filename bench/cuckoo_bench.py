"""Cuckoo insert micro-bench (VERDICT r3 directive #3 acceptance): times
the vectorized three-phase `_insert_all` against the round-3 per-item
Python loop (inlined below as the comparison baseline) on a single-bucket
rebuild-sized batch, and verifies both produce zero evictions and
identical membership answers. Run: `python bench/cuckoo_bench.py [n]`.

Results land in BENCH.md §Cuckoo rebuild.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commoncrawlscalatools_spark.operators.cuckoo import (  # noqa: E402
    SLOTS_PER_BUCKET,
    _alt_index,
    _fingerprints,
    _index1,
    _insert_all,
)


def legacy_insert_all(table, hashes, n_slots):
    """The round-3 per-item loop, verbatim semantics (baseline only)."""
    fps = _fingerprints(hashes)
    i1s = _index1(hashes, n_slots)
    evicted = 0
    for fp, i1 in zip(fps, i1s):
        fp = np.uint8(fp)
        i = int(i1)
        placed = False
        for idx in (i, int(_alt_index(np.array([i]), np.array([fp]), n_slots)[0])):
            row = table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                placed = True
                break
        if placed:
            continue
        cur_fp, cur_i = fp, i
        for kick in range(500):
            slot = kick % SLOTS_PER_BUCKET
            cur_fp, table[cur_i, slot] = table[cur_i, slot], cur_fp
            cur_i = int(_alt_index(np.array([cur_i]), np.array([cur_fp]), n_slots)[0])
            row = table[cur_i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur_fp
                break
        else:
            evicted += 1
    return table, evicted


def members(table, hashes, n_slots):
    fp = _fingerprints(hashes)
    i1 = _index1(hashes, n_slots)
    i2 = _alt_index(i1, fp, n_slots)
    return (table[i1] == fp[:, None]).any(axis=1) | (table[i2] == fp[:, None]).any(
        axis=1
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    # size for ~0.6 load factor (rebuild geometry the engine would pick)
    n_slots = 1 << int(np.ceil(np.log2(n / (SLOTS_PER_BUCKET * 0.6))))
    rng = np.random.default_rng(7)
    hashes = np.sort(
        rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    )

    t0 = time.time()
    tv = np.zeros((n_slots, SLOTS_PER_BUCKET), dtype=np.uint8)
    tv, ev_v = _insert_all(tv, hashes, n_slots)
    t_vec = time.time() - t0

    t0 = time.time()
    tl = np.zeros((n_slots, SLOTS_PER_BUCKET), dtype=np.uint8)
    tl, ev_l = legacy_insert_all(tl, hashes, n_slots)
    t_loop = time.time() - t0

    assert ev_v == 0 and ev_l == 0, (ev_v, ev_l)
    assert members(tv, hashes, n_slots).all(), "vectorized: false negative"
    assert members(tl, hashes, n_slots).all(), "legacy: false negative"
    # FP parity on a disjoint probe set (layouts differ; rates must agree)
    probes = rng.integers(-(2**62), 2**62, size=200_000, dtype=np.int64)
    fp_v = members(tv, probes, n_slots).mean()
    fp_l = members(tl, probes, n_slots).mean()

    print(
        {
            "n": n,
            "n_slots": n_slots,
            "load": round(n / (n_slots * SLOTS_PER_BUCKET), 3),
            "vectorized_s": round(t_vec, 3),
            "legacy_loop_s": round(t_loop, 3),
            "speedup": round(t_loop / t_vec, 1),
            "fp_vectorized": round(float(fp_v), 4),
            "fp_legacy": round(float(fp_l), 4),
        }
    )


if __name__ == "__main__":
    main()
