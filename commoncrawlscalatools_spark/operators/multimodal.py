"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, with Spark-side plumbing (schema, batching, partitioning) real
and tested; the actual codec work is stubbed (no media libs in this
container) behind a deterministic fake.

Pattern: media payloads ride as `binary` columns; decode/feature-extract
run as `mapInPandas` over Arrow batches, so each Python invocation sees a
columnar batch (zero-copy from the JVM), never a row. At 100 TB the media
table is partitioned by (modality, size bucket) so a decode pass prunes
to the modality it needs and batches stay memory-bounded via
`spark.sql.execution.arrow.maxRecordsPerBatch`.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def materialize_media(docs: DataFrame) -> DataFrame:
    """Media spans → (media_ref, payload binary, modality). The payload is
    a deterministic fake blob derived from the ref (sandbox stand-in for
    the blob store read); modality from the ref prefix."""
    media = docs.select(
        F.explode(F.filter(F.col("spans"), lambda s: s["kind"] == "media")).alias("s")
    ).select(F.col("s.media_ref").alias("media_ref"))
    modality = F.when(F.col("media_ref").startswith("media://img/"), "image").otherwise(
        "other"
    )
    payload = F.encode(
        F.concat(F.lit("FAKEBLOB:"), F.col("media_ref"), F.lit(":"), F.repeat(F.lit("x"), 64)),
        "utf-8",
    )
    return media.distinct().select(
        "media_ref", modality.alias("modality"), payload.alias("payload")
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode is unavailable in this container (no PIL/cv2).

    STUB — raises; `extract_media_metadata` uses `fake_decode_dims`."""
    raise NotImplementedError("image decode requires PIL/cv2 — not in this image")


def fake_decode_dims(refs: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Deterministic fake width/height from the ref hash (stable across
    runs/partitions — keeps tests meaningful without codec libs)."""
    h = refs.map(lambda r: int(hashlib.md5(r.encode()).hexdigest()[:8], 16))
    return (h % 1920 + 1).astype("int32"), (h // 1920 % 1080 + 1).astype("int32")


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """binary payload → typed metadata via Arrow-batched mapInPandas."""

    def extract(batches):
        for pdf in batches:
            w, h = fake_decode_dims(pdf["media_ref"])
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "width": np.where(pdf["modality"] == "image", w, pd.NA),
                    "height": np.where(pdf["modality"] == "image", h, pd.NA),
                    "duration_ms": pd.array([pd.NA] * len(pdf), dtype="Int64"),
                }
            )

    return media.mapInPandas(extract, MEDIA_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_pixel_bytes", T.LongType(), False),
        T.StructField("pixels", T.BinaryType(), False),
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Image resize plumbing: modality filter pushed to Spark (partition
    pruning at 100 TB — the decode pass reads only the image partitions),
    then an Arrow-batched mapInPandas emitting a fixed out_w×out_h×3 RGB
    buffer per image. The codec step is the documented env stub (no
    PIL/cv2 in this container): the fake 'resized' buffer is the payload's
    md5 hex tiled to exactly n bytes — deterministic, size-exact, and
    reproducible in SQL, so the binary-out batch shape (the part that
    matters for the real decoder drop-in) is oracle-verified."""
    n = out_w * out_h * 3
    reps = -(-n // 32)

    def gen(batches):
        for pdf in batches:
            hexes = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "width": np.int32(out_w),
                    "height": np.int32(out_h),
                    "n_pixel_bytes": np.int64(n),
                    "pixels": hexes.map(lambda hx: (hx * reps)[:n].encode("ascii")),
                }
            )

    return media.where(F.col("modality") == "image").mapInPandas(
        gen, RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def fake_duration_ms(ref: str) -> int:
    """Deterministic fake clip duration (1–61 s) from the ref hash — the
    stand-in for reading the container header (no ffmpeg here)."""
    return int(hashlib.md5(ref.encode()).hexdigest()[:8], 16) % 60000 + 1000


def sample_frames(
    media: DataFrame, interval_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plumbing: one input row fans out to one output
    row per sampled timestamp (0, interval, 2·interval … < duration,
    capped at max_frames) — the 1→N batch shape a real ffmpeg-backed
    sampler produces. Modality filter pushed to Spark; per-clip Python is
    inherent to codec work (decode is per-file), but it runs inside Arrow
    batches, never per-row on the wire. Frame bytes are the documented
    env stub: md5('FRAME:ref:idx') ascii — deterministic and SQL-
    reproducible, so fan-out arithmetic and schema are oracle-verified."""

    def gen(batches):
        for pdf in batches:
            refs, idxs, ts, durs, frames = [], [], [], [], []
            for ref in pdf["media_ref"]:
                dur = fake_duration_ms(ref)
                nf = min(max_frames, (dur - 1) // interval_ms + 1)
                for i in range(nf):
                    refs.append(ref)
                    idxs.append(i)
                    ts.append(i * interval_ms)
                    durs.append(dur)
                    frames.append(
                        hashlib.md5(f"FRAME:{ref}:{i}".encode()).hexdigest().encode()
                    )
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(ts, dtype="int64"),
                    "duration_ms": pd.Series(durs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return media.where(F.col("modality") == "video").mapInPandas(gen, FRAME_SCHEMA)
