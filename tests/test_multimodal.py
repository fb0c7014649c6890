"""Multimodal binary-column plumbing: schema, Arrow batching, deterministic
fake decode (real codecs stubbed — not in this container)."""

import pytest

from commoncrawlscalatools_spark.operators.frontier import (
    as_frontier_rows,
    canonicalize_seeds,
    schedule_round,
)
from commoncrawlscalatools_spark.operators.multimodal import (
    decode_image,
    extract_media_metadata,
    materialize_media,
)
from commoncrawlscalatools_spark.sources.fetch import fetch_and_extract
from commoncrawlscalatools_spark.sources.seeds import generate_seeds


def _docs(spark):
    seeds = generate_seeds(spark, 300, seed=5, n_hosts=10)
    fr = as_frontier_rows(canonicalize_seeds(seeds), 0)
    sched = schedule_round(fr, None, None, 1, per_host_cap=30)
    return fetch_and_extract(sched, n_hosts=10)


def test_media_metadata_schema_and_determinism(spark):
    media = materialize_media(_docs(spark))
    meta = extract_media_metadata(media)
    rows = meta.collect()
    assert len(rows) > 0
    assert set(meta.columns) == {
        "media_ref", "modality", "n_bytes", "content_hash", "width", "height", "duration_ms",
    }
    for r in rows:
        assert r["modality"] == "image"
        assert 1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080
        assert r["n_bytes"] > 0 and len(r["content_hash"]) == 32
    # deterministic: second pass produces identical metadata
    again = {r["media_ref"]: (r["width"], r["height"]) for r in extract_media_metadata(media).collect()}
    first = {r["media_ref"]: (r["width"], r["height"]) for r in rows}
    assert first == again


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")
