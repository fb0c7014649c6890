"""URL-seen membership: exact table (authoritative) + Bloom pre-filter.

Reference analog: distinct `warc_record_id` accounting
(countConversionRecordsInRandomWETPaths.scala:266-267) and the wetpaths
started/finished state; the north rule upgrades this to per-partition
Bloom/cuckoo URL-seen filters.

Determinism contract (SURVEY.md §7.4): Bloom false positives depend on
filter layout, so the Bloom filter is ONLY a pre-filter; the verified
unseen set always comes from an exact anti-join against the seen table.
Bucketing is by `pmod(url_hash, n_buckets)` with a FIXED n_buckets —
independent of executor count — so filter bytes are stable across
parallelism levels and can be checkpointed/resumed as data.

Scale shape (10^10 URLs):

  * The filter bytes travel to executors via ONE `sc.broadcast` (torrent
    broadcast on a real cluster), captured by the probe closure — never as
    a join column, which would replicate the per-bucket byte blob into the
    Arrow exchange once per candidate row (terabytes at design scale).
  * The probe output is persisted by `filter_unseen_flagged` so the single
    mapInPandas pass feeds both the definitely-new branch and the
    exact-verify branch (the caller unpersists the returned handle).
  * Maintenance is INCREMENTAL: rounds build a small delta filter from the
    round's new URLs only (`build_bloom(..., n_bits=fixed)`) and
    `merge_bloom` ORs it into the stored per-bucket bytes. Fixed bucketing
    + fixed per-bucket geometry guarantee mergeability; saturation only
    raises the FP rate (never a false negative). `n_items` is tracked per
    bucket and CrawlEngine.run_round checks n_items · bits_per_item >
    n_bits after every merge, rebuilding from the seen table at a larger
    fixed geometry (sized for the worst bucket) when any bucket saturates
    — surfaced in round metrics as `seen_filter_rebuilt`.
  * The exact anti-join is a shuffle on an 8-byte key over only the
    maybe-seen slice of the candidate set (bounded per round).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

BLOOM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_bits", T.LongType(), False),
        T.StructField("n_hashes", T.IntegerType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("bits", T.BinaryType(), False),
    ]
)


def _positions(hashes: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """Double-hashing positions: (h1 + i*h2) mod n_bits, vectorized.
    h1/h2 derived from the 64-bit url_hash by splitmix-style mixing."""
    x = hashes.astype(np.uint64)
    h1 = (x * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(16)
    h2 = ((x ^ (x >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(n_bits)).astype(np.int64)


def default_n_hashes(bits_per_item: int = 10) -> int:
    return max(1, int(round(bits_per_item * math.log(2))))


def build_bloom(
    seen: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 64,
    bits_per_item: int = 10,
    min_bits: int = 1 << 12,
    n_bits: int | None = None,
) -> DataFrame:
    """One Bloom filter per fixed hash bucket, built with applyInPandas
    (per-group vectorized numpy; the group is the partition-state unit).

    With `n_bits` set every bucket gets that FIXED geometry — required for
    incremental maintenance (`merge_bloom` ORs equal-length bit arrays).
    Without it, each bucket auto-sizes to its item count (one-shot use)."""
    n_hashes = default_n_hashes(bits_per_item)
    fixed_bits = n_bits

    def make_filter(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf[hash_col].to_numpy()
        n_items = len(hashes)
        if fixed_bits is not None:
            nb = fixed_bits
        else:
            nb = max(min_bits, 1 << int(math.ceil(math.log2(max(1, n_items * bits_per_item)))))
        bits = np.zeros(nb // 8, dtype=np.uint8)
        pos = _positions(hashes, nb, n_hashes).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "n_bits": [nb],
                "n_hashes": [n_hashes],
                "n_items": [n_items],
                "bits": [bits.tobytes()],
            }
        )

    bucketed = seen.select(
        F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int").alias("bucket"),
        F.col(hash_col),
    )
    return bucketed.groupBy("bucket").applyInPandas(make_filter, BLOOM_STATE_SCHEMA)


def merge_bloom(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two Bloom states with identical fixed geometry, per bucket.
    Distributed (n_buckets tiny rows); O(filter bytes), independent of
    |seen| — this is what makes per-round maintenance incremental."""

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["n_bits"].nunique() > 1 or pdf["n_hashes"].nunique() > 1:
            raise ValueError(
                f"bucket {key[0]}: mixed Bloom geometry "
                f"(n_bits={sorted(pdf['n_bits'].unique())}); incremental "
                "maintenance requires build_bloom(..., n_bits=<fixed>)"
            )
        out = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
        for blob in pdf["bits"].iloc[1:]:
            out |= np.frombuffer(blob, dtype=np.uint8)
        return pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "n_bits": [int(pdf["n_bits"].iloc[0])],
                "n_hashes": [int(pdf["n_hashes"].iloc[0])],
                "n_items": [int(pdf["n_items"].sum())],
                "bits": [out.tobytes()],
            }
        )

    return a.unionByName(b).groupBy("bucket").applyInPandas(merge, BLOOM_STATE_SCHEMA)


def collect_bloom(bloom_state: DataFrame) -> dict[int, tuple[int, int, bytes]]:
    """Bloom state DataFrame → driver dict {bucket: (n_bits, n_hashes, bits)}.
    The state is n_buckets rows; the blobs are the only payload."""
    return {
        int(r["bucket"]): (int(r["n_bits"]), int(r["n_hashes"]), bytes(r["bits"]))
        for r in bloom_state.collect()
    }


def bloom_maybe_seen(
    candidates: DataFrame,
    bloom_state,
    hash_col: str = "url_hash",
    n_buckets: int = 64,
) -> DataFrame:
    """Adds `maybe_seen boolean`: False ⇒ definitely unseen (skip the exact
    join); True ⇒ needs exact verification.

    `bloom_state` may be a Bloom state DataFrame, a dict from
    `collect_bloom`, or an existing `Broadcast` of such a dict. The filter
    bytes ship via ONE broadcast captured in the probe closure — the plan
    carries no join and no `bits` column; the probe is a narrow Arrow pass
    (numpy bit tests, no per-row Python)."""
    from pyspark.broadcast import Broadcast

    if isinstance(bloom_state, DataFrame):
        bc = candidates.sparkSession.sparkContext.broadcast(collect_bloom(bloom_state))
    elif isinstance(bloom_state, Broadcast):
        bc = bloom_state
    else:
        bc = candidates.sparkSession.sparkContext.broadcast(dict(bloom_state))

    out_schema = T.StructType(
        candidates.schema.fields + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def probe(it):
        state = bc.value
        for pdf in it:
            res = pdf.copy()
            maybe = np.zeros(len(pdf), dtype=bool)
            if len(pdf) and state:
                hashes = pdf[hash_col].to_numpy(dtype=np.int64)
                buckets = hashes % n_buckets  # numpy % matches Spark pmod sign
                for b in np.unique(buckets):
                    st = state.get(int(b))
                    if st is None:
                        continue  # empty bucket ⇒ nothing seen there
                    nb, nh, blob = st
                    bits = np.frombuffer(blob, dtype=np.uint8)
                    idx = np.nonzero(buckets == b)[0]
                    pos = _positions(hashes[idx], nb, nh)
                    hit = np.ones(len(idx), dtype=bool)
                    for row in pos:
                        hit &= (bits[row >> 3] & (np.uint8(1) << (row & 7).astype(np.uint8))) != 0
                    maybe[idx] = hit
            res["maybe_seen"] = maybe
            yield res

    return candidates.mapInPandas(probe, out_schema)


def filter_unseen_flagged(
    candidates: DataFrame,
    seen: DataFrame,
    hash_col: str = "url_hash",
    bloom_state=None,
    n_buckets: int = 64,
    maybe_seen_fn=None,
) -> tuple[DataFrame, DataFrame | None]:
    """Engine-internal variant of `filter_unseen`: returns
    (verified_unseen, flagged_handle). The flagged probe output is
    persisted so the single probe pass feeds both the definitely-new and
    the exact-verify branch; the CALLER owns `flagged_handle.unpersist()`
    once the result is materialized (the crawl loop does this after the
    round commits). `flagged_handle` is None when no pre-filter is used."""
    if bloom_state is None and maybe_seen_fn is None:
        return candidates.join(seen.select(hash_col), hash_col, "left_anti"), None
    flagged = (
        maybe_seen_fn(candidates)
        if maybe_seen_fn is not None
        else bloom_maybe_seen(candidates, bloom_state, hash_col, n_buckets)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    needs_check = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified_new = needs_check.join(seen.select(hash_col), hash_col, "left_anti")
    return definitely_new.unionByName(verified_new), flagged


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    hash_col: str = "url_hash",
    bloom_state=None,
    n_buckets: int = 64,
    maybe_seen_fn=None,
) -> DataFrame:
    """Verified-unseen candidates. With a pre-filter the exact anti-join
    runs only over the maybe-seen slice; the final set is identical either
    way (FP-independent). The probe is the Bloom one by default;
    `maybe_seen_fn(candidates) -> flagged` plugs in an alternative
    (operators/cuckoo.py) with the same `maybe_seen` contract.

    Library-safe: leaves NO cache behind (the probe may execute once per
    branch). Long-running callers that want the probe pass shared and
    cached should use `filter_unseen_flagged` and unpersist the returned
    handle themselves — attaching hidden persisted state to the returned
    DataFrame would leak a cache per call."""
    if bloom_state is None and maybe_seen_fn is None:
        return candidates.join(seen.select(hash_col), hash_col, "left_anti")
    flagged = (
        maybe_seen_fn(candidates)
        if maybe_seen_fn is not None
        else bloom_maybe_seen(candidates, bloom_state, hash_col, n_buckets)
    )
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    needs_check = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified_new = needs_check.join(seen.select(hash_col), hash_col, "left_anti")
    return definitely_new.unionByName(verified_new)
