"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata struct
(the lakehouse-standard pattern); decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages.

Decode paths, in order of preference at ``fake=False``:

* **PNG** — real, dependency-free: pure-Python chunk parse + zlib
  inflate + scanline unfilter (all five PNG filter types), 8-bit
  gray/RGB/gray-alpha/RGBA.
* **WAV** — real, dependency-free: stdlib ``wave`` PCM decode.
* **Anything else** — Pillow when importable (images), ffmpeg when on
  PATH (video frame sampling); otherwise ``NotImplementedError`` at
  the exact point the codec would run.

``fake=True`` (default, and the correctness-oracle path — q44)
produces a deterministic fake decode (stable per content hash) that
exercises the real Spark plumbing — schema, batching, partitioning —
end to end without any codec.

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type → samples per pixel (8-bit depth; palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/
    Paeth) over the inflated IDAT stream.  Returns height*width*channels
    bytes of pixel data."""
    stride = width * channels
    out = bytearray(height * stride)
    prev_off = -stride
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        off = y * stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[off + i - channels] if i >= channels else 0
                out[off + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[off + prev_off + i] if y > 0 else 0
                out[off + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[off + i - channels] if i >= channels else 0
                up = out[off + prev_off + i] if y > 0 else 0
                out[off + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = out[off + i - channels] if i >= channels else 0
                b = out[off + prev_off + i] if y > 0 else 0
                c = (
                    out[off + prev_off + i - channels]
                    if (y > 0 and i >= channels)
                    else 0
                )
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[off + i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def _decode_png(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Pure-Python PNG decode: (width, height, n_channels, pixels).
    8-bit depth, color types gray/RGB/gray+alpha/RGBA, no interlace."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace} "
                    "outside the dependency-free decoder's profile"
                )
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(bytes(idat))
    return width, height, channels, _png_unfilter(raw, width, height, channels)


def _decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """Stdlib WAV decode: (n_frames, sample_rate, n_channels, pcm)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        return (
            w.getnframes(),
            w.getframerate(),
            w.getnchannels(),
            w.readframes(w.getnframes()),
        )


def _encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal deterministic PNG encoder (8-bit, filter type 0 on every
    scanline, one IDAT, fixed zlib level) — the write half of the
    dependency-free codec.  Output is byte-stable for fixed input, so
    resized payloads are reproducible across runs and engines."""
    import struct
    import zlib

    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _resize_nearest(
    width: int, height: int, channels: int, pixels, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample (the deterministic, interpolation-free
    baseline): source index = floor(i * src / dst)."""
    src = memoryview(bytes(pixels))
    stride = width * channels
    out = bytearray(out_w * out_h * channels)
    xs = [min(x * width // out_w, width - 1) * channels for x in range(out_w)]
    pos = 0
    for y in range(out_h):
        row = min(y * height // out_h, height - 1) * stride
        for xoff in xs:
            base = row + xoff
            out[pos : pos + channels] = src[base : base + channels]
            pos += channels
    return bytes(out)


def resize_images(
    media: DataFrame, out_width: int, out_height: int, fake: bool = True
) -> DataFrame:
    """Resize each image payload to ``out_width x out_height``,
    returning the standard media layout (new payload + updated meta).

    ``fake=False`` really resizes: dependency-free PNG decode →
    nearest-neighbor resample → deterministic PNG re-encode (both
    halves pure Python + zlib, so the output bytes are reproducible).
    ``fake=True`` (the no-codec plumbing path, same policy as
    ``decode_media``) passes the payload through untouched and stamps
    the TARGET dimensions into the metadata struct — schema, batching
    and partitioning behave exactly like the real path.

    Scale: Arrow-batched ``mapInPandas``; payloads stay on executors,
    one narrow stage, no shuffle."""
    if out_width < 1 or out_height < 1:
        raise ValueError(f"bad target size {out_width}x{out_height}")

    out_schema = T.StructType(
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
                        T.StructField("width", T.IntegerType(), True),
                        T.StructField("height", T.IntegerType(), True),
                    ]
                ),
                True,
            ),
        ]
    )

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, content in zip(batch["media_id"], batch["content"]):
                payload = bytes(content) if content is not None else b""
                if fake:
                    out_payload = payload
                else:
                    w, h, ch, px = _decode_png(payload)
                    out_payload = _encode_png(
                        out_width,
                        out_height,
                        ch,
                        _resize_nearest(w, h, ch, px, out_width, out_height),
                    )
                rows.append(
                    {
                        "media_id": media_id,
                        "content": out_payload,
                        "meta": {
                            "media_type": "image",
                            "mime": "image/png",
                            "n_bytes": len(out_payload),
                            "width": out_width,
                            "height": out_height,
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "content", "meta"])

    return media.select("media_id", "content").mapInPandas(kernel, out_schema)


def _mean_feature(values, n_slices: int) -> list[float]:
    """Deterministic real-decode feature: per-slice mean of the decoded
    samples, normalized to [0, 1] — a decode-verifying signature (any
    pixel/sample change moves it), not a learned embedding."""
    import numpy as np

    arr = np.asarray(values, dtype=np.float64)
    if arr.size == 0:
        return [0.0] * n_slices
    bounds = np.linspace(0, arr.size, n_slices + 1, dtype=int)
    out = []
    for i in range(n_slices):
        lo, hi = bounds[i], bounds[i + 1]
        out.append(float(arr[lo:hi].mean()) if hi > lo else 0.0)
    return out


def _decode_real(payload: bytes, feature_dim: int) -> dict:
    """Dispatch one payload on its magic bytes to a real decoder.

    Image rows report (width, height, n_channels); audio rows map
    n_frames→width, sample_rate→height, channels→n_channels (the
    DECODED_SCHEMA is modality-neutral by design).  Features are
    per-slice means of the decoded bytes/samples scaled to [0, 1]."""
    import numpy as np

    if payload[:8] == _PNG_SIG:
        width, height, channels, pixels = _decode_png(payload)
        feature = _mean_feature(
            np.frombuffer(bytes(pixels), dtype=np.uint8) / 255.0, feature_dim
        )
        return {
            "width": width,
            "height": height,
            "n_channels": channels,
            "feature": feature,
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        n_frames, rate, channels, pcm = _decode_wav(payload)
        samples = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
        feature = _mean_feature((samples / 32768.0 + 1.0) / 2.0, feature_dim)
        return {
            "width": n_frames,
            "height": rate,
            "n_channels": channels,
            "feature": feature,
        }
    try:  # optional Pillow path for other image formats
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
        return {
            "width": img.width,
            "height": img.height,
            "n_channels": arr.shape[2] if arr.ndim == 3 else 1,
            "feature": _mean_feature(arr / 255.0, feature_dim),
        }
    except ImportError:
        raise NotImplementedError(
            "payload is neither PNG nor WAV and Pillow is not installed; "
            "the dependency-free decoders cover image/png + audio/wav"
        )


def _make_decoder(fake: bool, feature_dim: int):
    def decode_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not fake:
                rows = []
                for media_id, content in zip(batch["media_id"], batch["content"]):
                    payload = bytes(content) if content is not None else b""
                    decoded = _decode_real(payload, feature_dim)
                    rows.append({"media_id": media_id, **decoded})
                yield pd.DataFrame(
                    rows, columns=[f.name for f in DECODED_SCHEMA.fields]
                )
                continue
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
    """Decode + feature-extract each media row.  ``fake=True`` is the
    deterministic content-hash stub (the oracle path, q44);
    ``fake=False`` really decodes — PNG and WAV dependency-free, other
    image formats via Pillow when importable (see module docstring)."""
    return media.select("media_id", "content").mapInPandas(
        _make_decoder(fake, feature_dim), schema=DECODED_SCHEMA
    )


def _png_dims(png: bytes) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR without decoding pixels."""
    import struct

    if png[:8] != _PNG_SIG or png[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", png[16:24])
    return w, h


def _iter_png_stream(blob: bytes):
    """Split a concatenated-PNG stream (ffmpeg ``image2pipe`` output)
    into individual payloads by WALKING CHUNK STRUCTURE to each IEND —
    not by searching for the signature, which can occur inside
    compressed IDAT data."""
    import struct

    pos = 0
    n = len(blob)
    while pos + 8 <= n:
        if blob[pos : pos + 8] != _PNG_SIG:
            raise ValueError(f"PNG stream desynchronized at byte {pos}")
        start = pos
        pos += 8
        while pos + 8 <= n:
            (length,) = struct.unpack(">I", blob[pos : pos + 4])
            ctype = blob[pos + 4 : pos + 8]
            pos += 12 + length
            if ctype == b"IEND":
                break
        yield blob[start:pos]


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("frame_png", T.BinaryType()),
    ]
)


def _make_frame_sampler(every_n: int):
    def sampler(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import subprocess

        cols = [f.name for f in FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                if not payload:
                    continue
                # one short-lived ffmpeg per payload: the parallelism
                # unit is the Spark task (one payload decodes on one
                # core either way), and a pipe keeps the payload off
                # the local disk
                proc = subprocess.run(
                    [
                        "ffmpeg", "-v", "error", "-i", "pipe:0",
                        "-vf", f"select=not(mod(n\\,{every_n}))",
                        "-vsync", "vfr",
                        "-f", "image2pipe", "-vcodec", "png", "pipe:1",
                    ],
                    input=payload,
                    capture_output=True,
                )
                if proc.returncode != 0:
                    err = proc.stderr.decode("utf-8", "replace")[-300:]
                    raise ValueError(
                        f"ffmpeg failed for media_id={media_id}: {err}"
                    )
                for j, png in enumerate(_iter_png_stream(proc.stdout)):
                    w, h = _png_dims(png)
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_index": j * every_n,
                            "width": w,
                            "height": h,
                            "frame_png": png,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return sampler


def sample_frames(
    media: DataFrame, every_n: int = 10, fake: bool = True
) -> DataFrame:
    """Frame sampling for video payloads.

    ``fake=True`` (the oracle path, q-catalog plumbing): one row per
    sampled frame INDEX, frame count derived deterministically from
    payload size — no decode.

    ``fake=False`` really decodes: every ``every_n``-th frame is
    extracted by a subprocess ffmpeg (`-vf select=not(mod(n,N))` →
    ``image2pipe`` PNG stream, parsed chunk-structurally), returning
    ``(media_id, frame_index, width, height, frame_png)`` with each
    frame as a self-contained PNG the dependency-free codec can
    decode.  Requires ffmpeg on PATH (the sandbox has none — the
    integration test skips cleanly; same optional-dependency pattern
    as Pillow for non-PNG images).  Arrow-batched; payloads stream
    through pipes, never the local filesystem."""
    if not fake:
        import shutil

        if shutil.which("ffmpeg") is None:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg on PATH"
            )
        return media.select("media_id", "content").mapInPandas(
            _make_frame_sampler(every_n), schema=FRAME_SCHEMA
        )
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


# ------------------------------------------------------------------
# Perceptual image hashing (round 8): dHash + near-duplicate pairs.
# The reference has no image pipeline at all (its corpus is JSON
# security events); this is part of the LLM-training-data operator
# family — multimodal near-dedup was metadata/exact-binary only until
# now.  dHash is the public difference-hash algorithm (8x8 horizontal
# gradient signs over a 9x8 grayscale thumbnail -> 64 bits); two
# perceptually-similar images differ in few bits, so near-dup join is
# integer Hamming distance — served by the SAME pigeonhole block-join
# machinery as SimHash text dedup (operators/dedup.py
# hamming_block_pairs).
# ------------------------------------------------------------------

_DHASH_W, _DHASH_H = 9, 8


def _dhash64(payload: bytes) -> int | None:
    """64-bit dHash of one PNG payload: decode -> integer-mean
    grayscale -> nearest-neighbor 9x8 thumbnail -> horizontal gradient
    signs.  Bit (row r, col c) has weight ``2^(r*8+c)`` and is set
    when ``gray[r][c+1] > gray[r][c]``; returned as SIGNED int64 for
    Spark LongType.  Deterministic and integer-exact end to end (no
    float anywhere), so an oracle that can reproduce the thumbnail
    pixels replays the hash bit-for-bit."""
    import numpy as np

    if payload is None or len(payload) == 0:
        return None
    w, h, ch, px = _decode_png(bytes(payload))
    arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, ch)
    # integer channel mean (documented: alpha participates for
    # gray+alpha/RGBA — simple, deterministic, and exact)
    gray = (arr.sum(axis=2, dtype=np.int64) // ch).astype(np.uint8)
    if (w, h) != (_DHASH_W, _DHASH_H):
        gray = np.frombuffer(
            _resize_nearest(w, h, 1, gray.tobytes(), _DHASH_W, _DHASH_H),
            dtype=np.uint8,
        ).reshape(_DHASH_H, _DHASH_W)
    bits = (gray[:, 1:] > gray[:, :-1]).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64).reshape(
        _DHASH_H, _DHASH_W - 1
    )
    sig = int(np.bitwise_or.reduce((bits * weights).ravel()))
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def image_dhash(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-image 64-bit perceptual difference hash over the standard
    media layout: ``(media_id, dhash)``.  Real dependency-free PNG
    decode (``_decode_png``); empty/NULL payloads hash to NULL, and a
    non-PNG payload raises (a corrupt corpus should fail loudly, not
    silently hash garbage).

    Scale: Arrow-batched ``mapInPandas``, shuffle-free; payloads never
    leave their executor, and the output is 16 bytes/row regardless of
    image size — hash once, join many."""
    out = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch[id_col],
                    "dhash": pd.Series(
                        [_dhash64(c) for c in batch[content_col]],
                        dtype="object",
                    ),
                }
            )

    return media.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(content_col).alias(content_col),
    ).mapInPandas(kernel, out)


def dhash_near_duplicates(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-duplicate IMAGE pairs ``(id_a, id_b, hamming)``: dHash per
    image, then the pigeonhole Hamming block join shared with SimHash
    text dedup (``hamming_block_pairs`` — complete recall for
    ``max_hamming < blocks``, one keyed exchange, no cartesian).
    NULL-hash rows (empty payloads) cannot pair and are dropped
    first."""
    from defenda_data_lake_spark.operators.dedup import hamming_block_pairs

    sigs = image_dhash(media, id_col, content_col).filter(
        F.col("dhash").isNotNull()
    )
    return hamming_block_pairs(
        sigs,
        id_col="media_id",
        sig_col="dhash",
        max_hamming=max_hamming,
        blocks=blocks,
        size_hint_df=media,
    )


def synthetic_gray_png(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = _DHASH_W,
    height: int = _DHASH_H,
) -> DataFrame:
    """Manufacture a REAL grayscale PNG per row from a text column:
    pixel ``i`` (row-major) is the code point of character ``i`` of the
    text modulo 256, zero past the end.  This is the container's image
    CORPUS GENERATOR — no image dataset or codec library ships in the
    test environment, so codec-path operators (decode, resize, dHash)
    are exercised on genuine PNG bytes derived deterministically from
    the text tables, and an SQL oracle can reproduce the pixels (code
    points are engine-portable) without decoding anything.  Similar
    texts yield similar pixel grids, so near-dup TEXT rows become
    near-dup IMAGES — the right fixture shape for perceptual-hash
    queries.  Returns the standard media layout."""
    out = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    n_px = width * height

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for text in batch[text_col]:
                s = "" if text is None else str(text)
                px = bytes(
                    (ord(s[i]) % 256) if i < len(s) else 0
                    for i in range(n_px)
                )
                payloads.append(_encode_png(width, height, 1, px))
            yield pd.DataFrame(
                {
                    "media_id": batch[id_col],
                    "content": pd.Series(payloads, dtype=object),
                }
            )

    made = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(kernel, out)
    return as_media_table(made, "media_id", "content", media_type="image")


# ------------------------------------------------------------------
# Perceptual audio fingerprinting (round 8): the AUDIO twin of dHash.
# A fixed-window intensity-envelope fingerprint: the clip's FIRST 130
# samples split into 65 two-sample frames, per-frame energy =
# sum |sample|, 64 bits = energy gradient signs between consecutive
# frames.  Fingerprinting a fixed-length head window (the Shazam-
# style move) rather than length-proportional frames is what makes
# the hash edit-robust: proportional frame boundaries shift with
# every insertion, flipping ~10+ bits between near-dup clips
# (measured), while a fixed window keeps aligned content aligned —
# exactly why image dHash uses a fixed 9x8 grid.  Integer-exact end
# to end, so an oracle that reproduces the SAMPLES replays the
# fingerprint bit-for-bit; near-dup join is the same pigeonhole
# Hamming block machinery as SimHash/dHash.
# ------------------------------------------------------------------

_AFP_FRAMES = 65
_AFP_WINDOW = 2 * _AFP_FRAMES  # samples fingerprinted (head window)


def _audio_fp64(payload: bytes) -> int | None:
    """64-bit intensity-envelope fingerprint of one WAV payload:
    stdlib decode -> int16 samples -> first 130 samples as 65
    two-sample frames -> per-frame energy sum(|s|) -> gradient signs.
    Bit j has weight ``2^j`` and is set when ``energy[j+1] >
    energy[j]``; SIGNED int64 for Spark LongType.  Needs n >= 130
    samples; shorter payloads return None (they cannot fill the
    window)."""
    import io
    import wave

    import numpy as np

    if payload is None or len(payload) == 0:
        return None
    # open directly (not via _decode_wav) because the sample WIDTH must
    # be checked too: reinterpreting 8- or 24-bit PCM as int16 would
    # silently fingerprint garbage instead of failing loudly
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        channels, width = w.getnchannels(), w.getsampwidth()
        if channels != 1:
            raise ValueError(
                f"audio_fingerprint: expected mono PCM, got {channels} channels"
            )
        if width != 2:
            raise ValueError(
                f"audio_fingerprint: expected 16-bit PCM, got {8 * width}-bit"
            )
        pcm = w.readframes(w.getnframes())
    s = np.abs(np.frombuffer(pcm, dtype="<i2").astype(np.int64))
    if len(s) < _AFP_WINDOW:
        return None
    energy = s[:_AFP_WINDOW].reshape(_AFP_FRAMES, 2).sum(axis=1)
    bits = (energy[1:] > energy[:-1]).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    sig = int(np.bitwise_or.reduce(bits * weights))
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def audio_fingerprint(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-clip 64-bit perceptual fingerprint over the standard media
    layout: ``(media_id, afp)``.  Real stdlib WAV decode; empty/NULL
    and sub-65-sample payloads fingerprint to NULL; non-WAV payloads
    raise (corrupt corpora fail loudly).

    Scale: Arrow-batched ``mapInPandas``, shuffle-free; payloads never
    leave their executor and the output is 16 bytes/row — fingerprint
    once, join many (the image_dhash economics)."""
    out = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("afp", T.LongType()),
        ]
    )

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch[id_col],
                    "afp": pd.Series(
                        [_audio_fp64(c) for c in batch[content_col]],
                        dtype="object",
                    ),
                }
            )

    return media.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(content_col).alias(content_col),
    ).mapInPandas(kernel, out)


def audio_near_duplicates(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-duplicate AUDIO pairs ``(id_a, id_b, hamming)`` via the
    envelope fingerprint + the pigeonhole Hamming block join shared
    with SimHash/dHash (complete recall for ``max_hamming < blocks``,
    one keyed exchange, no cartesian).  NULL-fingerprint rows cannot
    pair and are dropped first."""
    from defenda_data_lake_spark.operators.dedup import hamming_block_pairs

    sigs = audio_fingerprint(media, id_col, content_col).filter(
        F.col("afp").isNotNull()
    )
    return hamming_block_pairs(
        sigs,
        id_col="media_id",
        sig_col="afp",
        max_hamming=max_hamming,
        blocks=blocks,
        size_hint_df=media,
    )


def synthetic_pcm_wav(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_rate: int = 8000,
) -> DataFrame:
    """Manufacture a REAL mono 16-bit WAV per row from a text column:
    sample ``i`` is ``((codepoint(text[i]) % 256) - 128) * 256`` — one
    sample per character.  The audio analog of
    :func:`synthetic_gray_png`: no audio dataset ships in the test
    environment, so codec-path operators (decode, chunking,
    fingerprint) are exercised on genuine RIFF/WAVE bytes derived
    deterministically from the text tables, and an SQL oracle can
    reproduce the samples from the same code points without decoding
    anything.  Similar texts yield similar waveforms, so near-dup TEXT
    rows become near-dup CLIPS.  Returns the standard media layout."""
    out = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        def encode(text) -> bytes:
            s = "" if text is None else str(text)
            vals = np.frombuffer(
                s.encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            samples = (((vals % 256) - 128) * 256).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sample_rate)
                w.writeframes(samples.tobytes())
            return buf.getvalue()

        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch[id_col],
                    "content": pd.Series(
                        [encode(t) for t in batch[text_col]], dtype=object
                    ),
                }
            )

    made = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(kernel, out)
    return as_media_table(made, "media_id", "content", media_type="audio")
