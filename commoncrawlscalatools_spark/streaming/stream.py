"""Streaming operators over the `events` table.

The reference is batch-with-resume (SURVEY.md §2.10) — its "streaming"
surface is the Parser iterator + rate monitor. The new engine adds real
Structured Streaming equivalents for the metrics/rate-monitoring layer:
tumbling-window aggregation (the analog of the reference's rolling parse-
rate window, Parser.scala:92-176) and gap sessionization. Each operator
has a batch twin with identical semantics so correctness is oracle-
checkable; the streaming wrapper drives the same plan incrementally.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def windowed_event_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window per-type counts/sums (batch twin)."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_event_agg_streaming(
    spark: SparkSession, events_path: str, width: str = "1 hour"
) -> DataFrame:
    """Same plan driven as a stream (file source → memory sink), with a
    watermark for late data; returns the materialized result."""
    schema = spark.read.parquet(events_path).schema
    src = events_path
    if os.path.isfile(events_path):
        # the file stream source requires a directory — stage a symlink
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(os.path.abspath(events_path), os.path.join(d, os.path.basename(events_path)))
        src = d
    stream = spark.readStream.schema(schema).parquet(src)
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC so
    # the cast is value-preserving
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = "windowed_event_agg_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: session starts where the gap from
    the previous event exceeds `gap_minutes`; session_id = cumulative count
    of session starts (lag + running sum — one shuffle on user_id)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # NTZ-safe (UTC session)
    gap = epoch - F.lag(epoch).over(w)
    is_start = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_start = events.withColumn("is_start", is_start)
    sess = F.sum("is_start").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        with_start.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
