"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with the Spark-side plumbing (schema, batching, partitioning)
real and the codec layer stubbed.

Design (BASELINE.json north star): media rides in a ``binary`` column
next to a metadata struct; decode / feature-extract / resize /
frame-sample run as **Arrow-batched ``mapInPandas``** — one Python
worker per partition, whole column batches across the boundary, never
row-at-a-time. The actual pixel/sample decoding requires codec
libraries (PIL/ffmpeg/torchaudio) that are NOT in this container, so:

* ``decode_media(..., real=True)`` raises ``NotImplementedError`` at
  the clearly marked integration point;
* the default deterministic fake "codec" derives a byte-stable feature
  vector from the payload (md5-chain, oracle-recomputable), so
  partitioning, batch shape, schema and downstream similarity ops are
  fully testable and identical in shape to a real deployment.

At 100 TB: payloads dominate partition size — ``media_repartition``
targets ~128 MiB of payload per partition (row-count based, from the
metadata's ``n_bytes``), keeping Arrow batches bounded; feature
extraction is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("width", LongType()),
                    StructField("height", LongType()),
                    StructField("sample_rate", LongType()),
                    StructField("n_frames", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (stable run-to-run, no RNG), metadata consistent with the kind."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    payload = F.encode(
        F.concat_ws("", *[F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{i}"))) for i in range(4)]),
        "UTF-8",
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.when(kinds == "image", F.lit(64)).cast("long").alias("width"),
            F.when(kinds == "image", F.lit(48)).cast("long").alias("height"),
            F.when(kinds == "audio", F.lit(16000)).cast("long").alias("sample_rate"),
            F.when(kinds == "video", F.lit(24)).cast("long").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: an md5 chain
    over the payload → ``dim`` floats in [0, 1). Block ``j`` is
    ``md5(payload || ":j")``; each byte maps to ``b/256.0`` (exact
    k/256 dyadics, so float/double conversions are lossless). md5 —
    not blake2b — so the DuckDB oracle can recompute the exact vector
    and the mapInPandas path is value-checked end-to-end, not
    rows-only."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        d = hashlib.md5(payload + f":{counter}".encode()).digest()
        out.extend(b / 256.0 for b in d)
        counter += 1
    return [float(x) for x in out[:dim]]


def extract_features(
    media: DataFrame,
    real: bool = False,
    decoder=None,
) -> DataFrame:
    """Feature extraction over the binary column via mapInPandas.

    ``decoder`` is the pluggable codec seam (the same injection pattern
    as ``sinks.kv.BatchedKVWriter``'s ``put_batch``): a picklable
    ``(payload: bytes, kind: str) -> list[float]`` shipped to the Arrow
    workers. A real deployment passes its PIL/ffmpeg/torchaudio encoder
    here with ``real=True``; this container has no codec libraries, so
    ``real=True`` WITHOUT a decoder raises at the clearly marked
    integration point, and the default decoder is the deterministic
    md5-chain fake (oracle-recomputable, so the Arrow path stays
    value-checked). The Spark plumbing — schema, Arrow batching,
    partitioning — is identical whichever decoder runs.
    """
    if real and decoder is None:
        raise NotImplementedError(
            "real codec decode requires PIL/ffmpeg — not present in this "
            "container; inject your codec via decoder=(payload, kind) -> "
            "list[float]"
        )
    decode = decoder or (lambda payload, kind: _fake_feature(payload))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        decode(bytes(p), k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, real: bool = False) -> DataFrame:
    """Image resize stub: plumbing (filter to images, mapInPandas shape,
    output schema = input schema with updated meta) is real; the pixel
    op is the stubbed codec layer."""
    if real:
        raise NotImplementedError("real resize requires an image codec (PIL)")
    images = media.filter(F.col("kind") == "image")
    return images.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.lit(width).cast("long").alias("width"),
            F.lit(height).cast("long").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )


def sample_frames(media: DataFrame, every_n: int = 8, real: bool = False) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled frame index
    (the explode shape a real sampler produces), payload decode stubbed."""
    if real:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_index"),
        "payload",
    )


def media_repartition(media: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition so each partition carries ~target_bytes of payload —
    keeps Arrow batches and task memory bounded when payloads are MBs."""
    stats = media.agg(
        F.sum("meta.n_bytes").alias("total"), F.count(F.lit(1)).alias("n")
    ).first()
    if not stats or not stats["total"]:
        return media
    parts = max(1, int(stats["total"] // target_bytes) + 1)
    return media.repartition(parts)
