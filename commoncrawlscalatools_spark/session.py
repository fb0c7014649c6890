"""SparkSession factory + table loading.

Local-mode defaults tuned for the sandbox (single JVM, 32 threads); the
same settings translate to a multi-executor cluster — shuffle partitions
scale with parallelism, AQE re-plans at runtime, Arrow is on for every
pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def get_spark(
    app: str = "commoncrawlscalatools_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Shuffle/spill on tmpfs: this host's root fs makes 32-way shuffle
    # writes kernel-bound (observed 44-83% system time); tmpfs removed a
    # 3× slowdown. On a real cluster this is the usual local-SSD scratch.
    if "SPARK_LOCAL_DIRS" not in os.environ:
        local_dir = "/dev/shm/spark-local"
        try:
            os.makedirs(local_dir, exist_ok=True)
            os.environ["SPARK_LOCAL_DIRS"] = local_dir
        except OSError:
            pass
    # Rule of thumb: shuffle partitions ≈ cores in local mode. On a real
    # cluster this is set per-round from input size (see plans/crawl.py).
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size: measured on the 2M-seed crawl round at 32
        # threads — 20k rows/batch cut the fetch/extract stage 22.6s→16.3s
        # (fewer batch handoffs per python worker); 50k regressed (memory
        # pressure), 10k was the stable-but-slower floor. Neutral at 8
        # threads.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "20000"),
        )
        # Right-size the heap + use the throughput collector: on this host,
        # G1 with a large heap collapsed allocation-heavy multithreaded
        # stages (observed 15-28× slowdowns at 32 threads; jstack showed all
        # threads RUNNABLE but 80% kernel time). ParallelGC + 12g turned the
        # same 32-thread crawl round from 27.9s into 8.7s.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver-generated parquet tables and register temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
