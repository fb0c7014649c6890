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

Scale shape (10^10 URLs): the seen table is hash-bucketed on url_hash; the
anti-join is a shuffle on a 8-byte key over only the *candidate* set
(bounded per round), while the Bloom pass (a broadcast of n_buckets
serialized filters + an Arrow-vectorized probe) eliminates the ~90%+ of
candidates that are definitely new without touching the big table.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def build_bloom(
    seen: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 64,
    bits_per_item: int = 10,
    min_bits: int = 1 << 12,
) -> DataFrame:
    """One Bloom filter per fixed hash bucket, built with applyInPandas
    (per-group vectorized numpy; the group is the partition-state unit)."""
    n_hashes = max(1, int(round(bits_per_item * math.log(2))))

    def make_filter(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf[hash_col].to_numpy()
        n_items = len(hashes)
        n_bits = max(min_bits, 1 << int(math.ceil(math.log2(max(1, n_items * bits_per_item)))))
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        pos = _positions(hashes, n_bits, n_hashes).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "n_bits": [n_bits],
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


def bloom_maybe_seen(
    candidates: DataFrame,
    bloom_state: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 64,
) -> DataFrame:
    """Adds `maybe_seen boolean`: False ⇒ definitely unseen (skip the exact
    join); True ⇒ needs exact verification. Bloom state is broadcast; the
    probe is one Arrow batch pass (numpy bit tests, no per-row Python)."""
    with_bucket = candidates.withColumn(
        "__bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    )
    joined = with_bucket.join(
        F.broadcast(bloom_state.withColumnRenamed("bucket", "__bucket")),
        "__bucket",
        "left",
    )
    out_schema = T.StructType(
        candidates.schema.fields + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    cand_cols = [f.name for f in candidates.schema.fields]

    def probe(it):
        for pdf in it:
            res = pdf[cand_cols].copy()
            maybe = np.zeros(len(pdf), dtype=bool)
            if len(pdf) and pdf["bits"].notna().any():
                for (n_bits, n_hashes, bits_bytes), grp in pdf[pdf["bits"].notna()].groupby(
                    ["n_bits", "n_hashes", "bits"], sort=False
                ):
                    bits = np.frombuffer(bits_bytes, dtype=np.uint8)
                    hashes = grp[hash_col].to_numpy()
                    pos = _positions(hashes, int(n_bits), int(n_hashes))
                    hit = np.ones(len(grp), dtype=bool)
                    for row in pos:
                        hit &= (bits[row >> 3] & (np.uint8(1) << (row & 7).astype(np.uint8))) != 0
                    maybe[pdf.index.get_indexer(grp.index)] |= hit
            res["maybe_seen"] = maybe
            yield res

    return joined.mapInPandas(probe, out_schema)


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    hash_col: str = "url_hash",
    bloom_state: DataFrame | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Verified-unseen candidates. With a Bloom state the exact anti-join
    runs only over the maybe-seen slice; the final set is identical either
    way (FP-independent)."""
    if bloom_state is None:
        return candidates.join(seen.select(hash_col), hash_col, "left_anti")
    flagged = bloom_maybe_seen(candidates, bloom_state, hash_col, n_buckets)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    needs_check = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    verified_new = needs_check.join(seen.select(hash_col), hash_col, "left_anti")
    return definitely_new.unionByName(verified_new)
