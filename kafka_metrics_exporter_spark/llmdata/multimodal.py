"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, or NotImplementedError for real codecs) —
but everything Spark-side is real and tested: the schema, the Arrow
batch shape through mapInPandas, partition sizing, and the
feature-extraction contract a real decoder would drop into.

Scale notes: binary payloads ride in the row, so
spark.sql.files.maxPartitionBytes controls memory per task; feature
extraction is mapInPandas (Arrow batches, one Python worker per core),
the standard shape for CPU-bound media preprocessing on a cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

_FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, checksum long, "
    "width int, height int, n_frames int, feature array<double>"
)


def attach_binary_column(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    media_type: str = "image",
    source_col: str | None = None,
) -> DataFrame:
    """Wrap an existing column's bytes as a MEDIA_SCHEMA frame — the
    ingestion shape for any binary modality."""
    content = F.encode(F.col(payload_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.struct(
            (F.col(source_col) if source_col else F.lit(None).cast("string")).alias(
                "source"
            ),
            F.lit(f"{media_type}/raw").alias("mime"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> dict:
    """Deterministic decode stub: real deployments replace this with
    PIL/libav; everything around it (batching, schema, partitioning)
    is identical.

    The checksum is the first 48 bits of md5(content) so an external
    SQL oracle can reproduce every derived field:
    ``('0x' || substr(md5(x), 1, 12))::BIGINT`` in DuckDB.
    """
    checksum = int(hashlib.md5(content or b"").hexdigest()[:12], 16)
    return {
        "n_bytes": len(content or b""),
        "checksum": checksum,
        "width": 64 + checksum % 64,
        "height": 64 + (checksum >> 8) % 64,
        "n_frames": 1 + (checksum >> 16) % 8,
        "feature": [((checksum >> (2 * i)) % 251) / 251.0 for i in range(8)],
    }


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + featurize binary media via Arrow-batched mapInPandas.

    decoder="fake"  → deterministic stub (tests/offline).
    decoder="pil"/"libav" → NotImplementedError: this environment ships
    no codecs; drop a real decode fn into _decode_batch to enable.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: media codecs are not available in this "
            "environment; the plumbing (schema, Arrow batching, partitioning) "
            "is real — plug a codec into _fake_decode's slot"
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode inlined (not a module-level reference): the worker-side
        # pickle stays self-contained, so this runs under any driver
        # session even when the package isn't importable on executors
        import hashlib as _hashlib

        def decode(content: bytes) -> dict:
            checksum = int(_hashlib.md5(content or b"").hexdigest()[:12], 16)
            return {
                "n_bytes": len(content or b""),
                "checksum": checksum,
                "width": 64 + checksum % 64,
                "height": 64 + (checksum >> 8) % 64,
                "n_frames": 1 + (checksum >> 16) % 8,
                "feature": [((checksum >> (2 * i)) % 251) / 251.0 for i in range(8)],
            }

        for pdf in batches:
            feats = [decode(c) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[
                [
                    "media_id",
                    "media_type",
                    "n_bytes",
                    "checksum",
                    "width",
                    "height",
                    "n_frames",
                    "feature",
                ]
            ]

    return df.mapInPandas(_decode_batch, _FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: the real op is a mapInPandas over `content`
    identical in shape to extract_features; unavailable without codecs."""
    raise NotImplementedError(
        "image resize requires a codec (PIL) not present in this environment; "
        "see extract_features for the mapInPandas shape it plugs into"
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub (same contract as resize_images)."""
    raise NotImplementedError(
        "video frame sampling requires libav/ffmpeg, not present here; "
        "see extract_features for the mapInPandas shape it plugs into"
    )
