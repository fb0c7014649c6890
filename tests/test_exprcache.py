"""exprcache: one build per (SparkContext, params); params key misses
rebuild; results stay usable across DataFrames (resolution by name)."""

from pyspark.sql import functions as F

from commoncrawlscalatools_spark.exprcache import cached_expr


def test_cached_expr_identity_and_key_miss(spark):
    calls = []

    def build(tag):
        calls.append(tag)
        return F.col("x") + len(tag)

    a = cached_expr("t1", lambda: build("a"), 1)
    b = cached_expr("t1", lambda: build("a"), 1)
    assert a is b and calls == ["a"]
    c = cached_expr("t1", lambda: build("b"), 2)
    assert c is not a and calls == ["a", "b"]
    # different tag, same params → distinct entry
    d = cached_expr("t2", lambda: build("c"), 1)
    assert d is not a and calls == ["a", "b", "c"]


def test_cached_expr_reusable_across_dataframes(spark):
    col = cached_expr("double_x", lambda: F.col("x") * 2)
    df1 = spark.range(3).select(F.col("id").alias("x")).select(col.alias("y"))
    df2 = spark.range(5).select(F.col("id").alias("x")).select(col.alias("y"))
    assert [r["y"] for r in df1.collect()] == [0, 2, 4]
    assert [r["y"] for r in df2.collect()] == [0, 2, 4, 6, 8]


def test_payload_memoized_per_params(spark):
    from commoncrawlscalatools_spark.exprcache import _CACHE
    from commoncrawlscalatools_spark.sources.fetch import synthesize_payload

    df = spark.range(2).select(F.col("id").alias("url_hash"))
    synthesize_payload(df, n_hosts=7)
    key_count = sum(1 for k in _CACHE if k[1] == "synthetic_payload")
    synthesize_payload(df, n_hosts=7)
    assert sum(1 for k in _CACHE if k[1] == "synthetic_payload") == key_count
    synthesize_payload(df, n_hosts=8)
    assert sum(1 for k in _CACHE if k[1] == "synthetic_payload") == key_count + 1
