"""Composed training-data pipeline (plans/training.py): stage effects are
visible end-to-end — gated docs, bench split, contaminated docs and
unsampled docs never reach the packed output; chunks respect the budget."""

import pytest
from pyspark.sql import functions as F

from commoncrawlscalatools_spark.plans.training import training_data_pipeline
from commoncrawlscalatools_spark.queries import (
    _QG,
    _TDP_DEFAULT,
    _TDP_PERMILLE,
    QUERIES,
)


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    return QUERIES["training_data_pipeline"](spark, sf_dir).collect()


def test_bench_split_never_packed(packed):
    assert packed  # pipeline yields chunks at sf0.001
    assert all(r["doc_id"] % 11 != 0 for r in packed)


def test_only_gated_docs_packed(spark, sf_dir, packed):
    import os

    from commoncrawlscalatools_spark.functions.text import quality_gates

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    g = quality_gates(d, "text", "doc_id", **_QG)
    ok = {
        r["doc_id"]
        for r in g.where(F.col("pass_len") & F.col("pass_repetition")).collect()
    }
    assert {r["doc_id"] for r in packed} <= ok


def test_chunks_respect_budget(packed):
    per_chunk: dict[int, int] = {}
    for r in packed:
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + r["n_tokens"]
    last = max(per_chunk)
    assert set(per_chunk) == set(range(last + 1))
    for ch, s in per_chunk.items():
        assert s == 500 or ch == last


def test_contaminated_and_duplicate_docs_dropped(spark):
    # hand corpus: doc 1 passes nothing upstream removes; doc 2 is an exact
    # duplicate of 1 (higher id loses); doc 13 embeds a bench 8-gram
    # (bench split = id % 11 == 0 -> ids 0,11,...; 13 is corpus).
    good = " ".join(f"w{i}" for i in range(30))  # 30 distinct tokens: passes gates
    bench_text = " ".join(f"b{i}" for i in range(30))
    contaminated = " ".join(
        ["x" + str(i) for i in range(10)] + bench_text.split()[:8]
        + ["y" + str(i) for i in range(12)]
    )
    rows = [
        (0, bench_text, "en"),  # bench split member
        (1, good, "en"),
        (2, good, "en"),  # exact dup of 1
        (13, contaminated, "en"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = training_data_pipeline(
        d,
        gate_params=_QG,
        permille={"en": 1000},  # keep every sampled stratum row
        default_permille=1000,
        budget=10,
        n_buckets=4,
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1}


def test_sampling_stage_uses_pipeline_rates(packed):
    # the pipeline's own rate table is what filtered the pack input: every
    # packed doc's deterministic draw is under its stratum rate
    assert _TDP_DEFAULT == 500 and set(_TDP_PERMILLE) == {"en", "zh", "es", "de", "fr"}
