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


def test_resize_images_shape_and_modality_filter(spark):
    from pyspark.sql import functions as F

    from commoncrawlscalatools_spark.operators.multimodal import resize_images

    media = spark.createDataFrame(
        [("media://img/a", "image", b"P1"), ("media://aud/b", "other", b"P2")],
        ["media_ref", "modality", "payload"],
    )
    rows = resize_images(media, 4, 2).collect()
    assert [r["media_ref"] for r in rows] == ["media://img/a"]  # non-images pruned
    r = rows[0]
    assert (r["width"], r["height"], r["n_pixel_bytes"]) == (4, 2, 24)
    assert len(r["pixels"]) == 24  # exact buffer size, not a multiple of 32
    again = resize_images(media.repartition(3), 4, 2).collect()[0]
    assert bytes(again["pixels"]) == bytes(r["pixels"])


def test_sample_frames_fanout_and_caps(spark):
    from commoncrawlscalatools_spark.operators.multimodal import (
        fake_duration_ms,
        sample_frames,
    )

    refs = [f"media://vid/{i}" for i in range(40)]
    media = spark.createDataFrame(
        [(r, "video", r.encode()) for r in refs], ["media_ref", "modality", "payload"]
    )
    by_ref = {}
    for row in sample_frames(media, interval_ms=1000, max_frames=8).collect():
        by_ref.setdefault(row["media_ref"], []).append(row)
    assert set(by_ref) == set(refs)
    for ref, rows in by_ref.items():
        dur = fake_duration_ms(ref)
        expect = min(8, (dur - 1) // 1000 + 1)
        assert len(rows) == expect
        assert sorted(r["frame_idx"] for r in rows) == list(range(expect))
        for r in rows:
            assert r["ts_ms"] == r["frame_idx"] * 1000 < dur == r["duration_ms"]
            assert len(r["frame"]) == 32


def test_sample_frames_short_clip_single_frame(spark):
    # any clip shorter than one interval still yields exactly frame 0
    from commoncrawlscalatools_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [("media://vid/x", "video", b"p")], ["media_ref", "modality", "payload"]
    )
    rows = sample_frames(media, interval_ms=10**9, max_frames=8).collect()
    assert len(rows) == 1 and rows[0]["frame_idx"] == 0 and rows[0]["ts_ms"] == 0
