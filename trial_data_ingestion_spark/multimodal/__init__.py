"""Multimodal column conventions (north star): image/audio/video as
opaque binary columns + typed metadata, processed by Arrow-batched
kernels.

Decoding is pluggable: pass a ``decoder``/``resizer`` callable.
:mod:`.codecs` provides REAL stdlib-only implementations for BMP/PNG
images (``image_decoder`` / ``image_resizer`` — header+filter+pixel
parse) and 16-bit PCM WAV audio (``audio_decoder`` /
``audio_resampler`` — ``wave`` decode + FFT band features), so the
non-stub path executes in CI on real bytes for both media types.
Formats that genuinely need absent libraries (JPEG, video) stay
env-gated: with no callable supplied the kernels
raise ``NotImplementedError`` eagerly at build time (a clean error
instead of a mid-job task failure), and tests also use the
deterministic fake kernels below where hash-oracle parity matters
(q32's DuckDB oracle reproduces the sha256 arithmetic exactly).
Everything Spark-side — schema, partitioning, UDF signatures, batch
shapes — is identical between fake and real kernels.

Scale notes: media bytes ride in parquet binary columns (or out-of-
line object-store paths via ``media_path`` for >~1 MB payloads —
keeping row groups small enough to scan); kernels are ``mapInPandas``
so bytes move Arrow-batched, never row-at-a-time pickled.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trial_data_ingestion_spark.multimodal import codecs  # noqa: E402,F401

MEDIA_METADATA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),       # png|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("media", T.BinaryType()),        # inline payload
    T.StructField("media_path", T.StringType()),   # or out-of-line ref
    T.StructField("metadata", MEDIA_METADATA),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
    T.StructField("feature_dim", T.IntegerType()),
])


def attach_fake_media(df: DataFrame, id_col: str,
                      media_type: str = "image") -> DataFrame:
    """Deterministic synthetic media for tests: payload bytes derived
    from the id (sha256-keyed), metadata filled in."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(8).alias("width"), F.lit(8).alias("height"),
        F.lit(0).cast("long").alias("duration_ms"))
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        payload.alias("media"),
        F.lit(None).cast("string").alias("media_path"),
        meta.alias("metadata"))


def fake_decoder(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for image/audio decode + featurize:
    a byte-histogram projection.  Real deployments replace this with
    PIL/librosa/ffmpeg-backed decoders of the same signature."""
    h = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(h[:dim * 2], dtype=np.uint8)
            .astype(np.float32).reshape(dim, 2).mean(axis=1) / 255.0)


def extract_features(df: DataFrame,
                     decoder: Optional[Callable] = None,
                     dim: int = 16) -> DataFrame:
    """Decode/featurize kernel over the media column.

    ``decoder(payload: bytes) -> np.ndarray`` runs once per row inside
    an Arrow batch; with no decoder supplied this raises
    ``NotImplementedError`` (media libs absent here) — tests pass
    :func:`fake_decoder`."""
    if decoder is None:
        raise NotImplementedError(
            "No media decoder selected; pass a decoder callable — "
            "codecs.image_decoder for real BMP/PNG payloads, "
            "codecs.audio_decoder for real 16-bit PCM WAV, "
            "codecs.video_decoder for real uncompressed AVI (all "
            "stdlib-only), multimodal.fake_decoder for deterministic "
            "tests.")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(m).astype(np.float32).tolist()
                     for m in pdf["media"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "features": feats,
                "feature_dim": [len(f) for f in feats],
            })

    return df.select("media_id", "media").mapInPandas(run, FEATURE_SCHEMA)


def resolve_media(df: DataFrame) -> DataFrame:
    """Materialize out-of-line payloads: rows whose ``media`` is NULL
    but ``media_path`` is set get their bytes loaded inside the Arrow
    kernel (per-executor, batch at a time — the driver never touches
    payload bytes); inline rows pass through untouched.

    The loader handles local/NFS paths with Python ``open`` — the
    right primitive for this environment; an object-store deployment
    swaps in its client here (same one-line contract).  Missing files
    raise with the offending path (a silent NULL would turn into a
    confusing decode error three operators later).

    Scale note: this is the row-group-size escape hatch the module
    docstring promises — tables carry 100-byte path strings instead
    of megabyte payloads until the exact kernel that needs bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            media = []
            for payload, path in zip(pdf["media"], pdf["media_path"]):
                if payload is None and path is not None:
                    with open(path, "rb") as f:
                        payload = f.read()
                media.append(payload)
            out["media"] = media
            yield out

    return df.mapInPandas(run, df.schema)


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: re-keys the payload
    with the target box.  Real deployments replace this with a
    PIL-backed ``Image.open(BytesIO(payload)).resize(...)`` of the
    same signature."""
    h = hashlib.sha256()
    h.update(payload or b"")
    h.update(f"{width}x{height}".encode())
    return h.digest()


def resize_media(df: DataFrame, width: int, height: int,
                 resizer: Optional[Callable] = None) -> DataFrame:
    """Resize kernel over the media column: same MEDIA_SCHEMA out,
    payload transformed and metadata width/height rewritten.

    ``resizer(payload: bytes, width, height) -> bytes`` runs per row
    inside an Arrow batch; with no resizer supplied this raises
    ``NotImplementedError`` (media libs absent here) — tests pass
    :func:`fake_resizer`.  Schema-preserving, so resize composes
    before :func:`extract_features` / :func:`frame_sample_stub`."""
    if resizer is None:
        raise NotImplementedError(
            "No resizer selected; pass a resizer callable — "
            "codecs.image_resizer for real BMP/PNG payloads, "
            "codecs.audio_resampler for real WAV (width = target "
            "sample rate), codecs.video_resizer for real uncompressed "
            "AVI (all stdlib-only), multimodal.fake_resizer for "
            "deterministic tests.")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["media"] = [resizer(m, width, height)
                            for m in pdf["media"]]
            out["metadata"] = [
                {**(meta or {}), "width": width, "height": height}
                for meta in pdf["metadata"]]
            yield out

    return df.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 extractor: Optional[Callable] = None) -> DataFrame:
    """REAL video frame sampling: decode each media payload, take one
    frame per ``every_ms``, and emit (media_id, frame_ts_ms, media)
    rows whose payload is the sampled frame re-encoded as a BMP image
    — so :func:`extract_features`/:func:`resize_media` with the IMAGE
    kernels compose directly downstream.

    ``extractor(payload, every_ms) -> [(ts_ms, frame_bytes), ...]``
    runs per row inside an Arrow batch; ``codecs.video_frame_extractor``
    is the stdlib uncompressed-AVI implementation.  With no extractor
    this raises ``NotImplementedError`` (compressed video needs
    libraries absent here) — :func:`frame_sample_stub` remains the
    metadata-only shape for those formats."""
    if extractor is None:
        raise NotImplementedError(
            "No frame extractor selected; pass "
            "codecs.video_frame_extractor for uncompressed AVI "
            "payloads (stdlib-only), or use frame_sample_stub for "
            "metadata-only timestamp plumbing.")

    frame_schema = ("media_id string, frame_ts_ms long, media binary")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts, payloads = [], [], []
            for mid, m in zip(pdf["media_id"], pdf["media"]):
                for t, frame in extractor(m, every_ms):
                    ids.append(mid)
                    ts.append(t)
                    payloads.append(frame)
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": ts,
                                "media": payloads})

    return df.select("media_id", "media").mapInPandas(run, frame_schema)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explodes per-media frame
    timestamps from metadata.duration_ms — the real frame decode would
    run inside the downstream ``extract_features`` kernel."""
    n_frames = (F.coalesce(F.col("metadata.duration_ms"), F.lit(0))
                / F.lit(every_ms)).cast("int")
    return (df.withColumn(
                "__frame_idx",
                F.explode(F.sequence(F.lit(0),
                                     F.greatest(n_frames - 1, F.lit(0)))))
              .withColumn("frame_ts_ms",
                          (F.col("__frame_idx") * every_ms).cast("long"))
              .select("media_id", "frame_ts_ms", "media"))
