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


def _synthetic_pixels(checksum: int, h: int, w: int, frame_idx: int = 0):
    """Deterministic single-channel pixel plane for the codec-free
    environment: pixel(i, j) = (checksum % 251 + 7i + 13j + 17f) % 256.
    An integer formula rather than a PRNG so an external SQL oracle can
    reproduce every derived statistic exactly (integer sums are exact
    in float64, so means match bit-for-bit)."""
    import numpy as np

    i = np.arange(h, dtype="int64").reshape(-1, 1)
    j = np.arange(w, dtype="int64").reshape(1, -1)
    return (checksum % 251 + 7 * i + 13 * j + 17 * frame_idx) % 256


def resize_images(
    df: DataFrame, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """Nearest-neighbor image resize over binary media rows.

    The resize itself is REAL — source dims from the decoded header,
    row/col index maps ``src_i = dst_i * src_h // dst_h``, ndarray
    gather, mean reduction — only the pixel DECODE is the deterministic
    stub (this container ships no codecs; decoder="pil" is the slot a
    real codec drops into).  One output row per image with the resized
    mean as the verification statistic; a real pipeline would also
    carry the resized plane forward as a binary column — same batch
    shape either way."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: no codecs in this environment; "
            "_synthetic_pixels is the slot a real decode fills"
        )

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as np

        def one(content: bytes) -> dict:
            checksum = int(_hashlib.md5(content or b"").hexdigest()[:12], 16)
            src_w = 64 + checksum % 64
            src_h = 64 + (checksum >> 8) % 64
            img = (checksum % 251 + 7 * np.arange(src_h, dtype="int64").reshape(-1, 1)
                   + 13 * np.arange(src_w, dtype="int64").reshape(1, -1)) % 256
            ri = np.arange(height, dtype="int64") * src_h // height
            cj = np.arange(width, dtype="int64") * src_w // width
            resized = img[np.ix_(ri, cj)]
            return {
                "src_width": src_w,
                "src_height": src_h,
                "width": width,
                "height": height,
                "mean_intensity": float(resized.mean()),
            }

        for pdf in batches:
            out = pd.DataFrame([one(c) for c in pdf["content"]])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.mapInPandas(
        _resize_batch,
        "media_id long, src_width int, src_height int, width int, height int, "
        "mean_intensity double",
    )


def sample_frames(df: DataFrame, every_n: int = 10, decoder: str = "fake") -> DataFrame:
    """Video frame sampling: keep frames at indices 0, n, 2n, … and
    emit one row per kept frame with its mean intensity.  The sampling
    cadence, per-frame explode, and reduction are real; frame pixels
    come from the deterministic stub (see resize_images)."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: no codecs in this environment; "
            "_synthetic_pixels is the slot a real decode fills"
        )

    def _sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as np

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            ws: list[int] = []
            hs: list[int] = []
            means: list[float] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                checksum = int(_hashlib.md5(content or b"").hexdigest()[:12], 16)
                w = 64 + checksum % 64
                h = 64 + (checksum >> 8) % 64
                n_frames = 1 + (checksum >> 16) % 8
                base = (checksum % 251 + 7 * np.arange(h, dtype="int64").reshape(-1, 1)
                        + 13 * np.arange(w, dtype="int64").reshape(1, -1))
                for f in range(0, n_frames, every_n):
                    ids.append(int(mid))
                    idxs.append(f)
                    ws.append(w)
                    hs.append(h)
                    means.append(float(((base + 17 * f) % 256).mean()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "width": ws,
                    "height": hs,
                    "mean_intensity": means,
                }
            )

    return df.mapInPandas(
        _sample_batch,
        "media_id long, frame_idx int, width int, height int, mean_intensity double",
    )


def audio_windows(
    df: DataFrame, window: int = 512, decoder: str = "fake"
) -> DataFrame:
    """Fixed-size audio windowing with per-window statistics (mean
    absolute amplitude + peak) — the feature-extraction shape for
    speech/audio training data (VAD, loudness filtering, silence
    trimming all consume exactly these per-window stats).

    The windowing, Arrow batching, per-row explode, and reductions are
    real; the PCM decode is the deterministic stub (sample(s) =
    (checksum % 251 + 11·s) % 256 − 128, sample_rate/n_samples derived
    from the checksum) so every statistic is reproducible by a SQL
    oracle: integer sums are float64-exact and ``window`` is a power of
    two, so the means match bit-for-bit.  A trailing partial window is
    dropped (deterministic, and what fixed-frame audio models do).
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: no codecs in this environment; "
            "the sample-synthesis line is the slot a real PCM decode fills"
        )

    def _win_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as np

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            rates: list[int] = []
            means: list[float] = []
            peaks: list[int] = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                checksum = int(_hashlib.md5(content or b"").hexdigest()[:12], 16)
                sample_rate = 8000 + (checksum % 3) * 4000
                n_samples = 2048 + checksum % 2048
                n_win = n_samples // window
                if n_win == 0:
                    continue
                s = np.arange(n_win * window, dtype="int64")
                amp = np.abs((checksum % 251 + 11 * s) % 256 - 128)
                planes = amp.reshape(n_win, window)
                for wi in range(n_win):
                    ids.append(int(mid))
                    idxs.append(wi)
                    rates.append(sample_rate)
                    means.append(float(planes[wi].mean()))
                    peaks.append(int(planes[wi].max()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "window_idx": idxs,
                    "sample_rate": rates,
                    "mean_abs": means,
                    "peak": peaks,
                }
            )

    return df.mapInPandas(
        _win_batch,
        "media_id long, window_idx int, sample_rate int, mean_abs double, peak long",
    )


def channel_stats(
    features: DataFrame, feature_col: str = "feature"
) -> DataFrame:
    """Per-channel corpus statistics over a feature-array column — the
    dataset-normalization pass every vision/audio pipeline runs before
    training (channel means/stds for the normalize transform).

    posexplode + one hash aggregation on the (tiny) channel key space:
    map-side partial aggregation reduces each partition to
    #channels rows before the single all-to-8-keys shuffle, so the cost
    at 100 TB is one pass over the feature column and a few KB of
    shuffle traffic.  Output: (channel, n, mean, std, min, max) with
    population std (the normalization convention).
    """
    x = features.select(
        F.posexplode(F.col(feature_col)).alias("channel", "__v")
    )
    return x.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__v").alias("mean"),
        F.stddev_pop("__v").alias("std"),
        F.min("__v").alias("min"),
        F.max("__v").alias("max"),
    )
