"""Multimodal column handling: opaque binary payloads + typed metadata.

Contract: media rides in a ``binary`` column with a metadata struct
(mime, width/height/duration, …). Decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``
— the right shape for CPU-heavy per-item work at 100 TB (one pass,
no shuffle, batch-size-controlled memory).

The actual codec calls are STUBBED (image/audio libraries are not in
this container): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake decoder so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, mime: str, out: str = "media"
) -> DataFrame:
    """Wrap a binary column into the standard media struct
    (payload + metadata). Metadata fields beyond mime start null and are
    filled by decoders."""
    return df.withColumn(
        out,
        F.struct(
            F.col(payload_col).alias("payload"),
            F.struct(
                F.lit(mime).alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ),
    )


_IMAGE_FEATURE_SCHEMA = "id bigint, n_bytes bigint, sha256 string, width int, height int, mean_luma double"


def image_features(
    df: DataFrame, id_col: str = "id", media_col: str = "media", fake: bool = False
) -> DataFrame:
    """Per-image features via mapInPandas (Arrow batches, no shuffle).

    Real decode is stubbed: with ``fake=False`` raises
    NotImplementedError at execution; ``fake=True`` derives
    deterministic pseudo-features from the payload bytes (hash-based) so
    the pipeline shape is exercised end-to-end.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(f"{media_col}.payload").alias("payload"))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires Pillow/libvips (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(b).hexdigest()
                h = int(digest[:8], 16)
                rows.append(
                    {
                        "id": rid,
                        "n_bytes": len(b),
                        "sha256": digest,
                        "width": 64 + h % 512,  # fake decode: deterministic dims
                        "height": 64 + (h >> 9) % 512,
                        "mean_luma": (h % 1000) / 1000.0,
                    }
                )
            yield pd.DataFrame(rows, columns=["id", "n_bytes", "sha256", "width", "height", "mean_luma"])

    return src.mapInPandas(_batches, _IMAGE_FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "id",
    media_col: str = "media",
    every_ms: int = 1000,
    fake: bool = False,
    chunk_bytes: int = 1024,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (id, frame_idx, frame_ts_ms, frame sha256). Stubbed decode; the fake
    mode emits ceil(payload_len/chunk_bytes) pseudo-frames (sha256 of
    each payload chunk) so the fan-out shape (mapInPandas producing >1
    row per input) is real AND deterministic — the per-frame hashes are
    reproducible by any engine that can chunk the same bytes."""
    src = df.select(F.col(id_col).alias("id"), F.col(f"{media_col}.payload").alias("payload"))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires ffmpeg (not in this container); "
                    "pass fake=True for the deterministic stub"
                )
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = max(1, (len(b) + chunk_bytes - 1) // chunk_bytes)
                for i in range(n_frames):
                    chunk = b[i * chunk_bytes : (i + 1) * chunk_bytes]
                    rows.append(
                        {
                            "id": rid,
                            "frame_idx": i,
                            "frame_ts_ms": i * every_ms,
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_ts_ms", "frame_sha256"])

    return src.mapInPandas(_batches, "id bigint, frame_idx int, frame_ts_ms bigint, frame_sha256 string")


def media_summary(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Pure-column media stats (no decode): byte length + sha256 of the
    payload, mime from metadata. This path never leaves the JVM."""
    return df.select(
        "*",
        F.octet_length(F.col(f"{media_col}.payload")).cast("bigint").alias("media_bytes"),
        F.lower(F.sha2(F.col(f"{media_col}.payload"), 256)).alias("media_sha256"),
        F.col(f"{media_col}.meta.mime").alias("media_mime"),
    )


def audio_features(
    df: DataFrame, id_col: str = "id", media_col: str = "media", fake: bool = False
) -> DataFrame:
    """Per-clip audio features via mapInPandas (duration, sample-rate
    guess, RMS-energy proxy). Real decode stubbed (no soundfile/librosa
    in this container); ``fake=True`` derives deterministic
    pseudo-features from the payload bytes so the plumbing is tested."""
    src = df.select(F.col(id_col).alias("id"), F.col(f"{media_col}.payload").alias("payload"))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "audio decoding requires soundfile/ffmpeg (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                h = int(hashlib.sha256(b).hexdigest()[:8], 16)
                rows.append(
                    {
                        "id": rid,
                        "n_bytes": len(b),
                        "duration_ms": len(b),  # fake: 1 byte ~ 1 ms
                        "sample_rate": [8000, 16000, 44100][h % 3],
                        "rms_energy": (h % 10000) / 10000.0,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["id", "n_bytes", "duration_ms", "sample_rate", "rms_energy"]
            )

    return src.mapInPandas(
        _batches, "id bigint, n_bytes bigint, duration_ms bigint, sample_rate int, rms_energy double"
    )


def image_resize(
    df: DataFrame,
    id_col: str = "id",
    media_col: str = "media",
    scale: float = 0.5,
    fake: bool = False,
) -> DataFrame:
    """Image resize via mapInPandas: emits a resized payload plus new
    dimensions (id, out_payload, out_bytes, out_sha256, width, height).

    Real resample is stubbed (no Pillow/libvips here). ``fake=True``
    models a ``scale``-factor downscale deterministically: output
    payload = the first ceil(n·scale²) bytes (area scales with scale²),
    dims = the fake-decode dims of ``image_features`` scaled down —
    fully reproducible byte arithmetic, so the resize STEP (binary in,
    binary out, metadata updated, Arrow batches through mapInPandas)
    is testable end-to-end and oracle-checkable."""
    src = df.select(F.col(id_col).alias("id"), F.col(f"{media_col}.payload").alias("payload"))
    out_schema = "id bigint, out_payload binary, out_bytes bigint, out_sha256 string, width int, height int"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image resampling requires Pillow/libvips (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                h = int(hashlib.sha256(b).hexdigest()[:8], 16)
                out = b[: math.ceil(len(b) * scale * scale)]
                rows.append(
                    {
                        "id": rid,
                        "out_payload": out,
                        "out_bytes": len(out),
                        "out_sha256": hashlib.sha256(out).hexdigest(),
                        "width": int((64 + h % 512) * scale),
                        "height": int((64 + (h >> 9) % 512) * scale),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "out_payload", "out_bytes", "out_sha256", "width", "height"],
            )

    return src.mapInPandas(_batches, out_schema)
