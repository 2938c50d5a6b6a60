"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata struct
(the lakehouse-standard pattern); decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages.

The actual codec work needs image/audio libraries not present in this
container, so the decode kernels are STUBBED: ``fake=True`` (default)
produces a deterministic fake decode (stable per content hash) that
exercises the real Spark plumbing — schema, batching, partitioning —
end to end; ``fake=False`` raises ``NotImplementedError`` at the point
a real decoder (Pillow/ffmpeg/torchaudio) would be called.

Scale notes: binary payloads never pass through the driver, and the
metadata struct lets Catalyst prune the (huge) binary column away for
metadata-only queries.  Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it for large
media to keep Arrow batches within executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def as_media_table(
    df: DataFrame, id_col: str, payload_col: str, media_type: str = "image"
) -> DataFrame:
    """Wrap an id + binary payload into the standard media layout
    (binary column + typed metadata struct)."""
    mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}.get(
        media_type, "application/octet-stream"
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("content"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(mime).alias("mime"),
            F.length(F.col(payload_col).cast("binary")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _make_decoder(fake: bool, feature_dim: int):
    def decode_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires Pillow/ffmpeg; "
                    "install and replace this kernel"
                )
            rows = []
            for media_id, content in zip(batch["media_id"], batch["content"]):
                payload = bytes(content) if content is not None else b""
                digest = hashlib.md5(payload).digest()
                # deterministic fake: dims/features derived from content
                width = 16 + digest[0] % 64
                height = 16 + digest[1] % 64
                feature = [
                    (int.from_bytes(digest[i : i + 2], "big") % 1000) / 1000.0
                    for i in range(0, min(len(digest) - 1, feature_dim * 2), 2)
                ]
                rows.append(
                    {
                        "media_id": media_id,
                        "width": width,
                        "height": height,
                        "n_channels": 3,
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return decode_batches


def decode_media(
    media: DataFrame, fake: bool = True, feature_dim: int = 8
) -> DataFrame:
    """Decode + feature-extract each media row (STUB: deterministic
    fake unless a real decoder is wired in)."""
    return media.select("media_id", "content").mapInPandas(
        _make_decoder(fake, feature_dim), schema=DECODED_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_n: int = 10, fake: bool = True
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index (STUB: frame count derived deterministically
    from payload size; a real implementation swaps in ffmpeg)."""
    if not fake:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    n_frames = (F.col("meta.n_bytes") / 1024 + 1).cast("int")
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )


def chunk_audio(
    media: DataFrame,
    chunk_ms: int = 1000,
    stride_ms: int = 500,
    bytes_per_ms: int = 16,
) -> DataFrame:
    """Audio chunking plumbing: one row per overlapping analysis window
    (``chunk_index``, ``start_ms``, ``end_ms``) per payload — the
    standard pre-segmentation for ASR/feature pipelines.  Duration is
    derived from payload size at ``bytes_per_ms`` (exact for fixed-rate
    PCM, e.g. 8 kHz 16-bit mono = 16 bytes/ms; a real implementation
    reads the container header instead).

    Pure JVM expression (``sequence`` + ``explode``) over the metadata
    struct: the binary column is pruned away, so at 100 TB this runs at
    metadata-scan speed and the chunk fan-out never touches payload
    bytes.

    Tail coverage: when ``duration - chunk`` is not a multiple of
    ``stride`` the strided sequence alone would leave up to
    ``stride - 1`` ms of trailing audio in no chunk, so a final start
    at ``greatest(0, duration - chunk)`` is appended (``array_distinct``
    collapses it when it coincides with the last strided start) — same
    tail rule as doc chunking (q68)."""
    duration_ms = (F.col("meta.n_bytes") / bytes_per_ms).cast("long")
    last_start = F.greatest(
        F.lit(0).cast("long"),
        ((duration_ms - chunk_ms) / stride_ms).cast("long") * stride_ms,
    )
    tail_start = F.greatest(F.lit(0).cast("long"), duration_ms - chunk_ms)
    # tail_start >= last_start >= every strided start, so the concat is
    # already ascending and posexplode indexes chunks in time order
    starts = F.array_distinct(
        F.concat(
            F.sequence(F.lit(0).cast("long"), last_start, F.lit(stride_ms)),
            F.array(tail_start),
        )
    )
    chunks = media.select(
        "media_id",
        duration_ms.alias("_duration_ms"),
        F.posexplode(starts).alias("chunk_index", "start_ms"),
    )
    return chunks.select(
        "media_id",
        "chunk_index",
        "start_ms",
        F.least(F.col("start_ms") + chunk_ms, F.col("_duration_ms")).alias(
            "end_ms"
        ),
    )
