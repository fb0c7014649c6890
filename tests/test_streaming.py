"""Structured Streaming twin must match the batch plan exactly."""

from commoncrawlscalatools_spark.streaming.stream import (
    sessionize,
    windowed_event_agg,
    windowed_event_agg_streaming,
)


def test_streaming_matches_batch(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_agg(events).collect()
    }
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_agg_streaming(
            spark, f"{sf_dir}/events.parquet"
        ).collect()
    }
    assert batch == streamed and len(batch) > 0


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 100, "c", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=10), 100, "c", 2.0, "{}"),
        (3, base + dt.timedelta(minutes=50), 100, "c", 3.0, "{}"),  # gap > 30m → new session
        (4, base, 200, "c", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert out == {(100, 1): 2, (100, 2): 1, (200, 1): 1}
