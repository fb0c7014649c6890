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
