"""Deterministic sampling + sequence packing tests (operators/sampling.py).
Everything must be byte-reproducible under re-partitioning — the whole
point of hash-draw sampling over rand(seed)."""

import pandas as pd
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.operators.sampling import (
    pack_sequences,
    reservoir_sample,
    stratified_sample,
)


def _docs(spark, n=400):
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "lang": [["en", "es", "de", "fr"][i % 4] for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def test_stratified_rates_and_boundaries(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, "lang", "doc_id", {"en": 1000, "es": 500, "de": 0}, default_permille=250
    )
    by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by.get("en") == 100          # permille 1000 keeps every row
    assert "de" not in by               # permille 0 drops every row
    assert 25 <= by.get("es", 0) <= 75  # ~50% of 100
    assert 10 <= by.get("fr", 0) <= 45  # default ~25% of 100


def test_stratified_deterministic_under_partitioning(spark):
    d = _docs(spark)
    kw = dict(strata_col="lang", id_col="doc_id", permille={"en": 300, "es": 700})
    a = sorted(r["doc_id"] for r in stratified_sample(d, **kw).collect())
    b = sorted(
        r["doc_id"] for r in stratified_sample(d.repartition(13, "lang"), **kw).collect()
    )
    assert a == b and len(a) > 0


def test_stratified_draws_independent_across_strata(spark):
    # The same id must not share its fate across strata (the draw is
    # salted with the stratum): relabel every row 'en'->'es' and the kept
    # id set should differ at equal rates.
    pdf = pd.DataFrame({"doc_id": range(300), "lang": ["en"] * 300})
    a = {
        r["doc_id"]
        for r in stratified_sample(
            spark.createDataFrame(pdf), "lang", "doc_id", {"en": 300}
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(
            spark.createDataFrame(pdf.assign(lang="es")), "lang", "doc_id", {"es": 300}
        ).collect()
    }
    assert a != b


def test_reservoir_exact_k_and_determinism(spark):
    d = _docs(spark)
    out = reservoir_sample(d, "lang", "doc_id", k=7)
    by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v == 7 for v in by.values()) and len(by) == 4
    again = reservoir_sample(d.repartition(9), "lang", "doc_id", k=7)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_reservoir_small_stratum_returns_all(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "lang": ["xx"] * 3})
    out = reservoir_sample(spark.createDataFrame(pdf), "lang", "doc_id", k=10)
    assert out.count() == 3


def _pack_reference(ids, toks, budget):
    """Independent pandas reference: concat in id order, split at budget."""
    rows, end = [], 0
    for i, tk in sorted(zip(ids, toks)):
        if tk <= 0:
            continue
        start, end = end, end + tk
        for ch in range(start // budget, (end - 1) // budget + 1):
            rows.append(
                (ch, i, min(end, (ch + 1) * budget) - max(start, ch * budget))
            )
    return sorted(rows)


def test_pack_sequences_matches_reference(spark):
    ids = list(range(50))
    toks = [(7 * i * i + 13) % 230 + 1 for i in ids]  # varied sizes, some > budget/2
    pdf = pd.DataFrame({"doc_id": ids, "tok": toks})
    out = pack_sequences(
        spark.createDataFrame(pdf).repartition(8),
        "doc_id",
        F.col("tok"),
        budget=100,
        n_buckets=6,
    )
    got = sorted((r["chunk_id"], r["doc_id"], r["n_tokens"]) for r in out.collect())
    assert got == _pack_reference(ids, toks, 100)


def test_pack_sequences_chunk_budget_invariant(spark):
    ids = list(range(80))
    toks = [(11 * i + 3) % 97 + 1 for i in ids]
    pdf = pd.DataFrame({"doc_id": ids, "tok": toks})
    out = pack_sequences(
        spark.createDataFrame(pdf), "doc_id", F.col("tok"), budget=64, n_buckets=5
    )
    per_chunk = {
        r["chunk_id"]: r["s"]
        for r in out.groupBy("chunk_id").agg(F.sum("n_tokens").alias("s")).collect()
    }
    total = sum(toks)
    last = max(per_chunk)
    for ch, s in per_chunk.items():
        assert s == 64 or (ch == last and s == total - 64 * last)
    assert sum(per_chunk.values()) == total
    assert set(per_chunk) == set(range(last + 1))  # no chunk gaps


def test_pack_sequences_drops_empty_docs_and_empty_input(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "tok": [0, 5, 0]})
    out = pack_sequences(
        spark.createDataFrame(pdf), "doc_id", F.col("tok"), budget=10
    ).collect()
    assert [(r["chunk_id"], r["doc_id"], r["n_tokens"]) for r in out] == [(0, 2, 5)]
    empty = pack_sequences(
        spark.createDataFrame(pdf[pdf.tok < 0], schema="doc_id long, tok long"),
        "doc_id",
        F.col("tok"),
        budget=10,
    )
    assert empty.count() == 0
    assert empty.columns == ["chunk_id", "doc_id", "n_tokens"]


# --- property fuzz: the distributed packing rewrite vs the naive reference --

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=200),
    n_buckets=st.integers(min_value=1, max_value=12),
    id_stride=st.integers(min_value=1, max_value=9),
)
def test_pack_sequences_property_vs_reference(
    spark, toks, budget, n_buckets, id_stride
):
    # non-contiguous ids, zero-token docs, tokens larger than the budget,
    # more buckets than docs — the bucketed prefix-sum must match the
    # naive concat-then-split reference on all of them
    ids = [i * id_stride for i in range(len(toks))]
    pdf = pd.DataFrame({"doc_id": ids, "tok": toks})
    out = pack_sequences(
        spark.createDataFrame(pdf, schema="doc_id long, tok long").repartition(4),
        "doc_id",
        F.col("tok"),
        budget=budget,
        n_buckets=n_buckets,
    )
    got = sorted((r["chunk_id"], r["doc_id"], r["n_tokens"]) for r in out.collect())
    assert got == _pack_reference(ids, toks, budget)


def test_quantile_buckets_balanced_under_clustered_ids(spark):
    """VERDICT r5 watch #3: the r5 linear (id-lo)*n/span bucketing collapsed
    when ids cluster in a few dense ranges. Quantile bounds must keep every
    bucket near the ideal row share, and bucket assignment must stay
    monotone in id (the contiguity invariant packing correctness needs)."""
    from collections import Counter

    from commoncrawlscalatools_spark.operators.sampling import (
        quantile_bucket_bounds,
        range_bucket,
    )

    # two dense clusters at opposite ends of a huge id span: linear split
    # would put ~everything in buckets 0 and n-1
    ids = list(range(1000)) + list(range(10_000_000_000, 10_000_001_000))
    df = spark.createDataFrame([(i,) for i in ids], schema="_id long")
    n = 8
    bounds = quantile_bucket_bounds(df, "_id", n)
    assert bounds == sorted(bounds)
    got = df.select(range_bucket(F.col("_id"), bounds).alias("b")).collect()
    cnt = Counter(r["b"] for r in got)
    ideal = len(ids) / n
    assert max(cnt.values()) <= 2 * ideal, cnt
    # monotone: bucket of max(cluster1) <= bucket of min(cluster2)
    b1 = sum(1 for b in bounds if 999 >= b)
    b2 = sum(1 for b in bounds if 10_000_000_000 >= b)
    assert b1 <= b2


def test_pack_sequences_property_clustered_ids_vs_reference(spark):
    """Hypothesis fuzz (VERDICT r5 next #5): packing output must be
    identical to the naive global-ordering reference no matter how ids
    cluster, for any bucket count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        clusters=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10**12),  # cluster start
                st.integers(min_value=1, max_value=8),  # cluster size
            ),
            min_size=1,
            max_size=4,
        ),
        budget=st.integers(min_value=3, max_value=40),
        n_buckets=st.sampled_from([1, 2, 7]),
    )
    def run(clusters, budget, n_buckets):
        rows = {}
        for start, size in clusters:
            for j in range(size):
                rows[start + j] = (start + j) % 13 + 1  # 1..13 tokens
        items = sorted(rows.items())
        df = spark.createDataFrame(items, schema="doc_id long, tok long")
        got = sorted(
            map(
                tuple,
                pack_sequences(
                    df.repartition(5), "doc_id", F.col("tok"),
                    budget=budget, n_buckets=n_buckets,
                ).collect(),
            )
        )
        # naive reference: global concat then split
        ref, off = [], 0
        for doc_id, tok in items:
            s, e = off, off + tok
            for c in range(s // budget, (e - 1) // budget + 1):
                ref.append(
                    (c, doc_id, min(e, (c + 1) * budget) - max(s, c * budget))
                )
            off = e
        assert got == sorted(ref)

    run()


def test_mixture_plan_hits_token_targets_in_expectation(spark):
    from commoncrawlscalatools_spark.operators.sampling import mixture_plan

    pdf = pd.DataFrame(
        {
            "doc_id": range(600),
            "lang": [["en", "es", "zh"][i % 3] for i in range(600)],
            "tok": [40 + (i % 7) for i in range(600)],
        }
    )
    d = spark.createDataFrame(pdf)
    weights = {"en": 0.75, "es": 0.25}  # zh absent -> dropped
    target = 30_000
    plan = mixture_plan(d, "lang", "doc_id", F.col("tok"), weights, target)
    rows = plan.collect()
    got = {}
    for r in rows:
        got.setdefault(r["lang"], 0)
        got[r["lang"]] += r["n_repeats"] * r["n_tokens"]
    # zh has weight 0: factor 0, zero repeats
    assert got.get("zh", 0) == 0
    # en/es within 12% of their targets (hash-draw expectation)
    assert abs(got["en"] - 22_500) / 22_500 < 0.12, got
    assert abs(got["es"] - 7_500) / 7_500 < 0.12, got
    # factor > 1 strata carry full epochs: en available ~8.6k tokens,
    # target 22.5k -> every en doc repeats at least twice
    en_min = min(r["n_repeats"] for r in rows if r["lang"] == "en")
    assert en_min >= 2


def test_mixture_plan_deterministic_under_partitioning(spark):
    from commoncrawlscalatools_spark.operators.sampling import mixture_plan

    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "lang": [["en", "es"][i % 2] for i in range(200)],
            "tok": [10 + (i % 5) for i in range(200)],
        }
    )
    d = spark.createDataFrame(pdf)
    a = sorted(
        map(tuple, mixture_plan(d, "lang", "doc_id", F.col("tok"),
                                {"en": 0.6, "es": 0.4}, 5_000).collect())
    )
    b = sorted(
        map(tuple, mixture_plan(d.repartition(9), "lang", "doc_id", F.col("tok"),
                                {"en": 0.6, "es": 0.4}, 5_000).collect())
    )
    assert a == b


def test_pack_sequences_rejects_non_numeric_ids(spark):
    """ADVICE r6 #3: a string id would cast to NULL and silently pack an
    empty result — the operator must raise instead."""
    import pytest
    from pyspark.sql import functions as F

    from commoncrawlscalatools_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [("urn:doc:a", 10), ("urn:doc:b", 20)], ["doc_id", "n_tok"]
    )
    with pytest.raises(TypeError, match="numeric"):
        pack_sequences(df, "doc_id", F.col("n_tok"), budget=16, n_buckets=4)
