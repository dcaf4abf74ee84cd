"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container): the
default "decoder" is a deterministic fake that derives features from the
bytes (so plumbing — schema, batching, partition sizing — is real and
tested); ``decoder="real"`` raises NotImplementedError where PIL/ffmpeg
would be called.

Scale posture: binary payloads never pass through Python row-at-a-time —
mapInPandas streams Arrow record batches; `spark.sql.execution.arrow.
maxRecordsPerBatch` bounds batch memory (set it ≈ a few hundred for
multi-MB blobs). Feature extraction is a map-only stage: no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque binary fixtures (payload = seeded bytes)."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.unhex(
        F.repeat(F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256), 8)
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        payload.alias("payload"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def _fake_decode_image(payload: pd.Series) -> pd.DataFrame:
    """STUB decode: deterministic features from bytes (stands in for
    PIL.Image.open + resize). Vectorized numpy over the Arrow batch."""
    n_bytes = payload.map(len).astype("int64")
    # fake dims derived from the first bytes
    first = payload.map(lambda b: b[0] if len(b) else 0).astype("int64")
    second = payload.map(lambda b: b[1] if len(b) > 1 else 0).astype("int64")
    width = (64 + (first % 16) * 32).astype("int32")
    height = (64 + (second % 16) * 32).astype("int32")
    feats = payload.map(
        lambda b: np.frombuffer(b[:64].ljust(64, b"\0"), dtype=np.uint8)
        .astype(np.float32)
        .tolist()
    )
    return pd.DataFrame(
        {"width": width, "height": height, "n_bytes": n_bytes, "feature": feats}
    )


def extract_image_features(
    media: DataFrame, decoder: str = "stub", batch_size: int | None = 256
) -> DataFrame:
    """Decode/feature-extract images via mapInPandas (Arrow batches)."""
    if decoder == "real":
        raise NotImplementedError(
            "real image decode requires PIL/libvips — not available in this "
            "container; plumbing is exercised with decoder='stub'"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _fake_decode_image(pdf["payload"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_n_bytes: int = 1024, decoder: str = "stub"
) -> DataFrame:
    """Frame sampling stub: emits one row per sampled 'frame' offset.
    Real implementation would ffmpeg-decode; the Spark-side shape (explode
    to frame rows, map-only) is the real contract."""
    if decoder == "real":
        raise NotImplementedError("real video decode requires ffmpeg")
    vids = media.where(F.col("kind") == "video")
    offsets = F.sequence(
        F.lit(0), F.greatest(F.length("payload") - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return vids.select(
        "media_id",
        F.explode(offsets).alias("frame_offset"),
        F.length("payload").alias("n_bytes"),
    )
