"""Multimodal column plumbing: opaque binary media + typed metadata.

Design (per the driver brief): image/audio/video ride as ``binary``
columns with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``.
The actual codec libraries are not in this container, so the decode step
is STUBBED: ``decode_media(..., codec="real")`` raises
``NotImplementedError``, while the default deterministic fake produces
stable pseudo-features so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested end-to-end.

Scale notes: media rows are large and skew-prone — ``repartition`` by a
uniform key (media sha) before the decode pass so one task never holds
two 4K videos plus thumbnails; ``maxRecordsPerBatch`` bounds Arrow batch
memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("meta_codec", StringType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha", StringType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)

_KINDS = ["image", "audio", "video"]


def attach_media(docs: DataFrame) -> DataFrame:
    """documents -> synthetic media table (deterministic fake payloads).

    Payload = utf-8 bytes of the text (a stand-in for real media bytes);
    kind/meta are closed-form from doc_id so oracles can re-derive them.
    """
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.lit("fake/v1").alias("meta_codec"),
        F.when(kind == "image", (F.col("doc_id") % 8 + 1) * 64)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("meta_width"),
        F.when(kind == "image", (F.col("doc_id") % 6 + 1) * 64)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("meta_height"),
        F.when(kind != "image", (F.col("doc_id") % 120 + 1) * 1000)
        .otherwise(F.lit(None))
        .cast("long")
        .alias("meta_duration_ms"),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-embedding: sha256-seeded, no codec needed."""
    digest = hashlib.sha256(payload).digest()
    out = []
    for i in range(dim):
        b = digest[(i * 2) % 32], digest[(i * 2 + 1) % 32]
        out.append(((b[0] << 8 | b[1]) / 65535.0) * 2.0 - 1.0)
    return out


def decode_media(
    media: DataFrame, dim: int = 16, codec: str = "fake", partitions: int | None = None
) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    ``codec="fake"`` (default): deterministic sha-seeded features — real
    Arrow plumbing, stub math. ``codec="real"``: raises
    ``NotImplementedError`` (image/audio libs absent in this container).
    """
    if codec != "fake":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; only codec='fake' is supported"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": pdf["payload"].map(
                        lambda b: _fake_features(bytes(b), dim)
                    ),
                }
            )

    src = media
    if partitions:
        # uniform re-spread so giant payloads don't pile into one task
        src = media.repartition(partitions, F.sha2(F.col("payload"), 256))
    return src.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """video -> (media_id, frame_idx, ts_ms) sample plan (metadata-only;
    decoding the actual frame bytes is behind the same codec stub).

    Pure Catalyst: sequence + explode, no Python.
    """
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                (F.col("meta_duration_ms") / every_ms).cast("long"),
            )
        ).alias("frame_idx", "step"),
    ).select(
        "media_id", "frame_idx", (F.col("step") * every_ms).alias("ts_ms")
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """image -> target dimensions preserving aspect ratio (metadata-only
    resize plan; pixel work is behind the codec stub). Pure Catalyst."""
    imgs = media.where(F.col("kind") == "image")
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("meta_width"), F.col("meta_height")).cast("double"),
    )
    return imgs.select(
        "media_id",
        "meta_width",
        "meta_height",
        F.ceil(F.col("meta_width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("meta_height") * scale).cast("int").alias("target_height"),
    )
