"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a narrow map (codegen'd
zip_with/aggregate dot product, no UDF) followed by TakeOrderedAndProject;
scales linearly and shuffles only k rows per partition.

Scale path: LSH bucketing by random-hyperplane signs (deterministic planes
derived from a hash formula, not RNG state) — candidates share a bucket, so
the search space drops by ~2^n_planes; exact cosine re-rank inside buckets.
An IVF variant (k-means coarse quantizer) would use the same
bucket-join shape; hyperplane LSH avoids an iterative training job.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two array columns. With `dim` known the sum unrolls
    into `dim` element_at terms — whole-stage-codegen'd, left-associated
    (same fold order as the HOF, so values are bit-identical). Without it,
    the aggregate/zip_with HOF fallback runs interpreted per element —
    fine for one-off expressions, NOT for a re-rank over millions of
    candidate pairs."""
    if dim is not None:
        out = F.lit(0.0)
        for i in range(1, dim + 1):
            out = out + F.element_at(a, i) * F.element_at(b, i)
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        out = F.lit(0.0)
        for i in range(1, dim + 1):
            e = F.element_at(a, i)
            out = out + e * e
        return F.sqrt(out)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Brute-force exact top-k by cosine similarity to a literal query
    vector. orderBy+limit compiles to TakeOrderedAndProject (per-partition
    top-k then a k-row merge on the driver — no global sort).

    Expression choice (BENCH r1→r2 regression chase): a ONE-OFF scan keeps
    the HOF dot/norm — the dim-unrolled form pays ~1 s of Janino codegen
    compile that dominates a single-query pass at any scan size where the
    driver overhead matters, while the interpreted HOF streams fine. The
    query norm is a Python-side constant (left-assoc sum, bit-identical to
    the unrolled Spark fold). Joins/re-ranks that evaluate cosine over
    millions of candidate pairs amortize the compile and use dim= unrolls
    (knn_join_lsh)."""
    q = F.lit([float(x) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    av = _as_double(F.col(vec_col))
    scored = df.select(
        F.col(id_col),
        F.round(dot(av, q) / (l2_norm(av) * F.lit(qn)), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def hyperplane(seed: int, plane_id: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d is a hash of
    (seed, plane_id, d) mapped to [-1, 1). Reproducible in any engine."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{plane_id}:{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) % 2000) / 1000.0 - 1.0)
    return out


def lsh_bucket_expr(
    vec: Column,
    planes: list[list[float]],
    unroll: bool = True,
    pre_cast: bool = False,
) -> Column:
    """Bucket id = bit-packed signs of dot(vec, plane_j). `unroll` follows
    the one-off-vs-amortized rule (PLANS.md §ANN): the unrolled dots cost
    ~1 s of Janino compile per invocation, right for the write-time index
    build, wrong for a single interactive probe pass (bit-identical fold
    order either way). `pre_cast=True` declares `vec` already a
    MATERIALIZED array<double> column — the unrolled form must never wrap
    an inline transform(cast), because every element_at term re-evaluates
    the whole cast array (measured ~3·dim array builds per row on the
    write path)."""
    bucket = F.lit(0)
    av = vec if pre_cast else _as_double(vec)
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(
            dot(av, p, dim=len(plane) if unroll else None) >= 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
    return bucket


def lsh_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 4,
    probe_bits: int = 1,
    seed: int = 7,
) -> DataFrame:
    """ANN: restrict exact scoring to the query's LSH bucket plus its
    multi-probe neighbors (all buckets within Hamming distance
    `probe_bits` — removes the single-probe recall cliff). This variant
    computes the bucket column per query over the full table — the
    correctness baseline; the 100 TB query path is
    write_bucketed_embeddings + lsh_cosine_topk_bucketed below, where the
    bucket is precomputed and hive/Iceberg-partitioned at write time so a
    query scans only len(probe_masks) partitions (partition pruning)."""
    dim = len(query_vec)
    planes = [hyperplane(seed, j, dim) for j in range(n_planes)]
    q_bucket = 0
    for j, plane in enumerate(planes):
        if sum(float(a) * float(b) for a, b in zip(query_vec, plane)) >= 0:
            q_bucket |= 1 << j
    probes = [q_bucket ^ m for m in probe_masks(n_planes, probe_bits)]
    bucketed = df.withColumn(
        "bucket", lsh_bucket_expr(F.col(vec_col), planes, unroll=False)
    )
    return cosine_topk(
        bucketed.filter(F.col("bucket").isin(probes)), query_vec, vec_col, id_col, k
    )


def write_bucketed_embeddings(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    seed: int = 7,
    dim: int = 64,
) -> None:
    """Write-time ANN index build: compute the LSH bucket column ONCE and
    persist the table hive-partitioned by it (Iceberg partition-spec
    stand-in, same discipline as the frontier's state partitioning). This
    is the reference's pattern of building a search structure at corpus
    write time — its Lucene index (createCorpus.scala:286-287) — recast as
    partition layout: an ANN query then reads only its probe partitions
    (PartitionFilters in the scan, evidenced in PLANS.md §ANN) instead of
    scanning and hashing the full table per query. One pass over the data;
    the bucket expression is the same deterministic hyperplane formula the
    per-query variant uses, so results are identical."""
    from commoncrawlscalatools_spark.spread import spread

    planes = [hyperplane(seed, j, dim) for j in range(n_planes)]
    # spread the (possibly single-file) scan so the bucket pass
    # parallelizes; materialize the double cast ONCE; then cluster by
    # bucket so each write task owns whole buckets (one file per bucket
    # instead of n_tasks·n_buckets small files)
    cast_df = spread(df.select(id_col, vec_col), id_col).select(
        id_col, vec_col, _as_double(F.col(vec_col)).alias("__ev")
    )
    bucketed = cast_df.select(
        id_col,
        vec_col,
        lsh_bucket_expr(F.col("__ev"), planes, pre_cast=True).alias("bucket"),
    ).repartition(1 << n_planes, "bucket")
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)


def lsh_cosine_topk_bucketed(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 4,
    probe_bits: int = 1,
    seed: int = 7,
) -> DataFrame:
    """ANN query over a write_bucketed_embeddings table: compute the
    query's probe bucket set driver-side (tiny), filter on the PARTITION
    column, exact-cosine top-k inside the surviving partitions. The bucket
    filter prunes at the file level — at 10^10 rows the scan touches
    len(probes)/2^n_planes of the data."""
    dim = len(query_vec)
    planes = [hyperplane(seed, j, dim) for j in range(n_planes)]
    q_bucket = 0
    for j, plane in enumerate(planes):
        if sum(float(a) * float(b) for a, b in zip(query_vec, plane)) >= 0:
            q_bucket |= 1 << j
    probes = [q_bucket ^ m for m in probe_masks(n_planes, probe_bits)]
    df = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    return cosine_topk(df, query_vec, vec_col, id_col, k)


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    dim: int = 64,
    sample: int = 4096,
    iters: int = 8,
) -> list[list[float]]:
    """Deterministic coarse quantizer for IVF: Lloyd's k-means on a
    bounded, deterministically-chosen sample (lowest `sample` ids),
    trained driver-side in numpy. This is the standard IVF shape (faiss
    trains its quantizer on a sample too): at 10^10 rows the training
    input stays a few thousand vectors — the collect is O(sample·dim),
    never O(corpus). Deterministic: sample selection, seeding (first k
    distinct sample vectors) and iteration count are all data-derived, so
    the same corpus always yields the same centroids — which lets the
    DuckDB oracle inline them as literals. Centroids are L2-normalized
    (cosine IVF: nearest centroid = argmax dot with normalized centroid)."""
    import numpy as np

    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .select(_as_double(F.col(vec_col)).alias("v"))
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if x.ndim != 2 or x.shape[0] < k:
        raise ValueError(
            f"kmeans sample has {0 if x.ndim != 2 else x.shape[0]} vectors, "
            f"need >= k={k}"
        )
    if dim != x.shape[1]:
        raise ValueError(f"dim={dim} but sample vectors have {x.shape[1]} components")
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    # seed from the first k DISTINCT normalized vectors: duplicate rows in
    # the sample must not spawn duplicate centroids (dead clusters)
    _, first_idx = np.unique(x, axis=0, return_index=True)
    seed_idx = np.sort(first_idx)[:k]
    if len(seed_idx) < k:
        raise ValueError(
            f"sample holds only {len(seed_idx)} distinct vectors, need >= k={k}"
        )
    cent = x[seed_idx].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cent[j] = c / max(np.linalg.norm(c), 1e-12)
    return [[float(v) for v in c] for c in cent]


def ivf_assign_expr(
    vec: Column,
    centroids: list[list[float]],
    dim: int,
    unroll: bool = False,
    pre_cast: bool = False,
) -> Column:
    """Cluster id = argmax_j dot(vec, centroid_j) — 1-based array_position
    over the dot-product array (ties → first index, matching the oracle's
    list_position). The vector's own norm is constant across j, so plain
    dots rank identically to cosine.

    `unroll` follows the one-off-vs-amortized rule (PLANS.md §ANN): the
    dim-unrolled form costs seconds of Janino compile (k·dim terms — 8×64
    ≈ 4k expression nodes) which dominates a single query, so per-query
    assignment keeps the interpreted HOF dot (bit-identical fold order);
    the write-time index build amortizes the compile over the full table
    and unrolls."""
    v = vec if pre_cast else _as_double(vec)
    d = dim if unroll else None
    dots = F.array(
        *[F.round(dot(v, F.lit([float(x) for x in c]), dim=d), 9) for c in centroids]
    )
    return F.array_position(dots, F.array_max(dots)).cast("int")


def ivf_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN (the brief's named alternative to LSH bucketing): assign
    every row to its nearest coarse centroid, probe the query's `nprobe`
    nearest cells, exact-cosine re-rank inside them. Same plan shape as
    the LSH path — a selective filter then cosine_topk — so the same
    write-time option applies (partition the corpus by cluster id and the
    probe filter becomes partition pruning). Recall is tuned by nprobe
    (probing more cells) instead of LSH's probe_bits/n_tables."""
    import numpy as np

    dim = len(query_vec)
    q = np.array(query_vec, dtype=np.float64)
    cent = np.array(centroids, dtype=np.float64)
    # dots rounded to 9 decimals before ranking — the same tie-break
    # contract the in-plan assignment and the DuckDB oracle use
    probes = [
        int(j) + 1
        for j in np.argsort(-np.round(cent @ q, 9), kind="stable")[:nprobe]
    ]
    assigned = df.withColumn(
        "__cell", ivf_assign_expr(F.col(vec_col), centroids, dim)
    )
    return cosine_topk(
        assigned.filter(F.col("__cell").isin(probes)), query_vec, vec_col, id_col, k
    )


def write_ivf_embeddings(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> None:
    """Write-time IVF index: assign the cell ONCE and persist the table
    hive-partitioned by it — the same write-time discipline as
    write_bucketed_embeddings, with Voronoi cells instead of LSH buckets.
    A query then reads only its nprobe cell partitions (PartitionFilters
    file pruning); at 10^10 rows the scan touches nprobe/k of the data."""
    from commoncrawlscalatools_spark.spread import spread

    assigned = spread(df.select(id_col, vec_col), id_col).select(
        id_col, vec_col, _as_double(F.col(vec_col)).alias("__ev")
    ).select(
        id_col,
        vec_col,
        ivf_assign_expr(
            F.col("__ev"), centroids, dim, unroll=True, pre_cast=True
        ).alias("cell"),
    ).repartition(len(centroids), "cell")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_cosine_topk_partitioned(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF query over a write_ivf_embeddings table: probe cells computed
    driver-side (tiny), filter on the PARTITION column, exact re-rank.
    Identical results to ivf_cosine_topk over the same centroids (pinned
    in tests/test_similarity.py)."""
    import numpy as np

    q = np.array(query_vec, dtype=np.float64)
    cent = np.array(centroids, dtype=np.float64)
    probes = [
        int(j) + 1
        for j in np.argsort(-np.round(cent @ q, 9), kind="stable")[:nprobe]
    ]
    df = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    return cosine_topk(df, query_vec, vec_col, id_col, k)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    left_vec: str,
    right_vec: str,
    left_id: str,
    right_id: str,
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """EXACT k nearest right-rows per left-row: brute force, O(|L|·|R|).
    This is the small-|L| baseline (a handful of query vectors broadcast
    against the corpus) and the recall oracle for knn_join_lsh — it is NOT
    the corpus-vs-corpus primitive; use knn_join_lsh for that."""
    from pyspark.sql import Window as W

    j = F.broadcast(left.select(left_id, left_vec)).crossJoin(
        right.select(right_id, right_vec)
    )
    scored = j.select(
        F.col(left_id),
        F.col(right_id),
        F.round(
            cosine(_as_double(F.col(left_vec)), _as_double(F.col(right_vec)), dim), 6
        ).alias("cos_sim"),
    )
    w = W.partitionBy(left_id).orderBy(F.desc("cos_sim"), F.col(right_id))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale: candidates
    are pairs sharing an LSH hyperplane bucket (never all-pairs — the
    bucket key bounds the self-join exactly like minhash banding bounds
    shingle dedup), verified by exact cosine ≥ threshold. High-cosine
    near-dups agree on almost every hyperplane sign, so bucket collision
    is the designed recall path; size 2^n_planes to cluster parallelism."""
    planes = [hyperplane(seed, j, dim) for j in range(n_planes)]
    b = df.select(
        id_col, vec_col, lsh_bucket_expr(F.col(vec_col), planes).alias("__bucket")
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = a.join(
        c,
        (F.col("a.__bucket") == F.col("b.__bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(
            cosine(
                _as_double(F.col(f"a.{vec_col}")), _as_double(F.col(f"b.{vec_col}")), dim
            ),
            6,
        ).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


def probe_masks(n_planes: int, probe_bits: int) -> list[int]:
    """Multi-probe XOR masks: the zero mask plus every mask with popcount ≤
    probe_bits — probing all buckets within Hamming distance `probe_bits`
    of the query's own bucket (the standard multi-probe LSH recall fix)."""
    masks = [0]
    if probe_bits >= 1:
        masks += [1 << j for j in range(n_planes)]
    if probe_bits >= 2:
        masks += [
            (1 << i) | (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)
        ]
    if probe_bits >= 3:
        raise ValueError("probe_bits > 2 not supported (probe count explodes)")
    return masks


def knn_join_lsh(
    left: DataFrame,
    right: DataFrame,
    left_vec: str,
    right_vec: str,
    left_id: str,
    right_id: str,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    probe_bits: int = 1,
    n_tables: int = 1,
    seed: int = 7,
) -> DataFrame:
    """Approximate kNN join at corpus-vs-corpus scale: LSH-bucket BOTH
    sides with the same deterministic hyperplanes, replicate each query row
    across its multi-probe buckets, join on the bucket key, exact-cosine
    re-rank, window top-k per query.

    Cost shape: |R| rows hashed once; |L|·(1 + n_planes + C(n_planes,2)·
    [probe_bits≥2]) replicated rows; ONE shuffle join on the bucket key —
    never a cross join. Each right row occupies exactly one bucket and
    probe masks are distinct, so a (left,right) pair meets at most once
    (no dedup needed before ranking).

    Sizing at scale: 2^n_planes buckets must exceed the cluster's task
    parallelism (e.g. 16 planes → 65k buckets for a 1000-executor job);
    residual bucket skew is AQE skew-join territory. Recall is tunable on
    two independent axes — probe_bits (Hamming-≤b probing removes the
    single-probe cliff) and n_tables (L independent plane sets, the
    classic 1-(1-r)^L amplification; costs an L× replication of the
    corpus side of the join). See test_similarity.py for the measured
    recall floor."""
    rb = knn_corpus_bucket_rows(right, right_vec, right_id, dim, n_planes, n_tables, seed)
    # Probe side interpreted (unroll=False): the query batch is small by
    # contract, and the unrolled per-plane dot costs a fresh Janino
    # compile per invocation — measured ~2 s of fixed wall per call for
    # bit-identical bucket values. The corpus side keeps the codegen'd
    # unroll: its cost is per-row and amortizes the compile at scale.
    lb = knn_probe_rows(
        left, left_vec, left_id, dim, n_planes, probe_bits, n_tables, seed,
        unroll=False,
    )
    return _knn_rank_join(lb, rb, left_vec, right_vec, left_id, right_id, k, dim)


def _knn_bucket_col(
    vec: Column, table: int, dim: int, n_planes: int, seed: int,
    unroll: bool = True, pre_cast: bool = False,
) -> Column:
    planes = [hyperplane(seed + 1000 * table, j, dim) for j in range(n_planes)]
    # join key packs the table id above the bucket bits so tables
    # never collide: key = (table << n_planes) | bucket
    bucket = F.lit(0)
    av = vec if pre_cast else _as_double(vec)
    for j, plane in enumerate(planes):
        p = F.lit([float(x) for x in plane])
        # unroll=False: the HOF dot (interpreted, zero Janino compile) —
        # the right trade for a per-call probe side of a few rows; the
        # write-time corpus pass keeps the codegen'd unroll (with the
        # cast MATERIALIZED first — see lsh_bucket_expr pre_cast). Same
        # fold order ⇒ bit-identical bucket values on both join sides.
        d = dot(av, p, dim=len(plane) if unroll else None)
        bucket = bucket + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket + F.lit(table << n_planes)


def knn_corpus_bucket_rows(
    right: DataFrame,
    right_vec: str,
    right_id: str,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 1,
    seed: int = 7,
) -> DataFrame:
    """Corpus side of the kNN join: each row exploded to its per-table
    bucket. This is the half worth AMORTIZING — write it once with
    write_knn_corpus_buckets and every subsequent query batch skips the
    corpus-side hashing entirely (knn_join_lsh_bucketed)."""
    from commoncrawlscalatools_spark.spread import spread

    return (
        spread(right.select(right_id, right_vec), right_id)
        .select(
            right_id, right_vec, _as_double(F.col(right_vec)).alias("__ev")
        )
        .select(
            right_id, right_vec,
            F.array(
                *[
                    _knn_bucket_col(
                        F.col("__ev"), t, dim, n_planes, seed, pre_cast=True
                    )
                    for t in range(n_tables)
                ]
            ).alias("__bs"),
        )
        .select(right_id, right_vec, F.explode("__bs").alias("__bucket"))
    )


def knn_probe_rows(
    left: DataFrame,
    left_vec: str,
    left_id: str,
    dim: int = 64,
    n_planes: int = 4,
    probe_bits: int = 1,
    n_tables: int = 1,
    seed: int = 7,
    unroll: bool = True,
) -> DataFrame:
    """Query side: one row per (query, table, probe mask). `unroll=False`
    evaluates the plane dots as interpreted HOFs — zero codegen compile,
    right for an interactive query batch of a few rows against a prebuilt
    corpus index (bit-identical values either way)."""
    masks = probe_masks(n_planes, probe_bits)
    # compute query buckets BEFORE the probe explode: the generator
    # replicates rows over the literal mask array, so the plane dot
    # products run once per (query row, table), not once per probe
    return (
        left.select(
            left_id, left_vec,
            F.array(
                *[
                    _knn_bucket_col(F.col(left_vec), t, dim, n_planes, seed, unroll)
                    for t in range(n_tables)
                ]
            ).alias("__b0s"),
        )
        .select(left_id, left_vec, F.explode("__b0s").alias("__b0"))
        .select(left_id, left_vec, "__b0", F.explode(F.lit(masks)).alias("__m"))
        .select(
            left_id, left_vec,
            # XOR only touches the low n_planes bits; the table tag survives
            F.col("__b0").bitwiseXOR(F.col("__m")).alias("__bucket"),
        )
    )


def _knn_rank_join(
    lb: DataFrame,
    rb: DataFrame,
    left_vec: str,
    right_vec: str,
    left_id: str,
    right_id: str,
    k: int,
    dim: int,
) -> DataFrame:
    from pyspark.sql import Window as W

    j = lb.join(rb.select(right_id, right_vec, "__bucket"), "__bucket")
    # with n_tables > 1 a pair can meet in several tables — dedupe before
    # ranking (scores are deterministic, any surviving row is identical)
    pairs = j.select(left_id, left_vec, right_id, right_vec).dropDuplicates(
        [left_id, right_id]
    )
    # materialize the double-cast arrays BEFORE the dim-unrolled cosine:
    # each unrolled element_at against an inline transform(cast) re-runs
    # the whole cast per term (~3·dim array builds per pair)
    cast_pairs = pairs.select(
        left_id,
        right_id,
        _as_double(F.col(left_vec)).alias("__lv"),
        _as_double(F.col(right_vec)).alias("__rv"),
    )
    scored = cast_pairs.select(
        F.col(left_id),
        F.col(right_id),
        F.round(cosine(F.col("__lv"), F.col("__rv"), dim), 6).alias("cos_sim"),
    )
    w = W.partitionBy(left_id).orderBy(F.desc("cos_sim"), F.col(right_id))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def write_knn_corpus_buckets(
    right: DataFrame,
    path: str,
    right_vec: str,
    right_id: str,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 1,
    seed: int = 7,
) -> None:
    """Write-time kNN-join index (VERDICT r4 #3): the corpus side's
    per-table bucket rows, hive-partitioned by the bucket key — the
    kNN-join twin of write_bucketed_embeddings. One pass over the corpus;
    every later query batch joins against the precomputed layout instead
    of re-hashing |R| rows per call, and the probe-bucket filter prunes at
    the partition level."""
    rb = knn_corpus_bucket_rows(right, right_vec, right_id, dim, n_planes, n_tables, seed)
    # precompute the corpus-side L2 norm at write time (codegen'd unroll
    # over a MATERIALIZED cast — the compile amortizes over the whole
    # corpus here, cf. the IVF write-time rule): the query-time re-rank
    # then only evaluates the cross dot product per candidate pair
    rb = rb.select(
        "*", _as_double(F.col(right_vec)).alias("__ev")
    ).select(
        right_id, right_vec, "__bucket",
        l2_norm(F.col("__ev"), dim).alias("__rnorm"),
    ).repartition(n_tables << n_planes, "__bucket")
    rb.write.mode("overwrite").partitionBy("__bucket").parquet(path)


def knn_join_lsh_bucketed(
    spark: SparkSession,
    path: str,
    left: DataFrame,
    left_vec: str,
    left_id: str,
    right_vec: str = "embedding",
    right_id: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 4,
    probe_bits: int = 1,
    n_tables: int = 1,
    seed: int = 7,
) -> DataFrame:
    """kNN join against a write_knn_corpus_buckets table: only the probe
    rows are built per call. The corpus scan is pruned to the union of the
    queries' probe buckets — bounded driver-side by the bucket keyspace
    (≤ n_tables·2^n_planes values), never by |L| — so the collect here is
    O(2^n_planes), not a data-size collect. Identical hyperplanes/masks/
    ranking as knn_join_lsh ⇒ identical results (oracle-shared)."""
    from pyspark.sql import Window as W

    lb = knn_probe_rows(
        left, left_vec, left_id, dim, n_planes, probe_bits, n_tables, seed,
        unroll=False,  # per-call probe side: HOF dots, no Janino compile
    )
    probe_buckets = [
        r["__bucket"] for r in lb.select("__bucket").distinct().collect()
    ]
    rb = spark.read.parquet(path).filter(F.col("__bucket").isin(probe_buckets))
    # Query-time re-rank, compile-free: corpus norms were computed at
    # write time (__rnorm), the query norm is evaluated once per probe row
    # (HOF), and the cross dot is the interpreted HOF — candidates after
    # bucket pruning are a tiny fraction of the corpus, so interpreted
    # eval beats paying ~2 s of Janino compile per query batch. Fold
    # orders match the unrolled forms ⇒ bit-identical cos_sim.
    j = lb.withColumn("__lnorm", l2_norm(_as_double(F.col(left_vec)))).join(
        rb.select(right_id, right_vec, "__rnorm", "__bucket"), "__bucket"
    )
    pairs = j.select(left_id, left_vec, "__lnorm", right_id, right_vec, "__rnorm").dropDuplicates(
        [left_id, right_id]
    )
    scored = pairs.select(
        F.col(left_id),
        F.col(right_id),
        F.round(
            dot(_as_double(F.col(left_vec)), _as_double(F.col(right_vec)))
            / (F.col("__lnorm") * F.col("__rnorm")),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy(left_id).orderBy(F.desc("cos_sim"), F.col(right_id))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
