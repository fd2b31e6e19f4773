"""Multimodal columns: image/audio/video as opaque binary with typed
metadata; decode/feature-extract/resize/frame-sample as Arrow-batched
Pandas UDFs over mapInPandas.

The container has no image/audio libraries, so the decode kernels are
STUBBED behind _HAS_CODECS (deterministic fakes keep the plumbing — schema,
partitioning, UDF signature, batch shape — real and tested). On a real
cluster you'd swap `_fake_decode_image` for PIL/libvips inside the same
mapInPandas operator; nothing else changes.

Scale: binary payloads ride in parquet as binary columns; mapInPandas
processes Arrow record batches so Python overhead amortizes per batch, not
per row; `maxRecordsPerBatch` bounds executor memory for large blobs;
metadata-only queries never touch the binary column thanks to parquet
column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - the container ships no codec libs
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False


MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("modality", T.StringType(), False),      # image|audio|video
    T.StructField("content", T.BinaryType(), True),         # opaque payload
    T.StructField("mime_type", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])

IMAGE_FEATURES_DDL = (
    "media_id string, n_bytes bigint, sha string, width int, height int, "
    "mean_luma double"
)


def attach_binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata columns computed natively from the binary payload —
    no Python, full codegen: size + content hash."""
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("bigint")) \
             .withColumn("sha", F.sha2(F.col(content_col), 256))


def _fake_decode_image(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decode: derives (width, height,
    mean_luma) from the payload hash. Replace with a real codec in prod."""
    if payload is None:
        return 0, 0, 0.0
    h = hashlib.md5(payload).digest()  # noqa: S324 — fake decode, not crypto
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def extract_image_features(df: DataFrame, content_col: str = "content",
                           id_col: str = "media_id") -> DataFrame:
    """mapInPandas image feature extraction. Arrow batches in/out; the
    decode kernel is the only Python-side work."""
    if not _HAS_CODECS:
        decode = _fake_decode_image
    else:  # pragma: no cover
        raise NotImplementedError("real codec path: wire PIL decode here")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) for p in pdf[content_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf[content_col]],
                "sha": [hashlib.sha256(p).hexdigest() if p is not None else ""
                        for p in pdf[content_col]],
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "mean_luma": [f[2] for f in feats],
            })

    return df.mapInPandas(run, schema=IMAGE_FEATURES_DDL)


RESIZED_DDL = (
    "media_id string, content binary, width int, height int, "
    "src_width int, src_height int"
)


def resize_images(df: DataFrame, max_side: int = 256,
                  content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """mapInPandas image resize: aspect-preserving fit into max_side.

    The scaling ARITHMETIC is real; the pixel re-encode is stubbed (the
    fake emits the original payload — a real codec swaps in PIL's
    thumbnail+save inside the same kernel, nothing else changes). Output
    carries both source and target dims so downstream filters (e.g. drop
    upscales) stay native.
    """
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path: wire PIL thumbnail here")
    decode = _fake_decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                w, h, _ = decode(payload)
                scale = min(1.0, max_side / max(w, h)) if max(w, h) else 0.0
                rows.append((mid, payload, int(w * scale), int(h * scale), w, h))
            yield pd.DataFrame(rows, columns=[
                "media_id", "content", "width", "height", "src_width", "src_height"])

    return df.mapInPandas(run, schema=RESIZED_DDL)


AUDIO_FEATURES_DDL = (
    "media_id string, n_bytes bigint, sha string, duration_s double, rms double"
)


def extract_audio_features(df: DataFrame, content_col: str = "content",
                           id_col: str = "media_id",
                           bytes_per_second: int = 32000) -> DataFrame:
    """mapInPandas audio feature extraction: duration estimate from byte
    length (real for fixed-rate PCM-ish payloads) + a stubbed RMS (the
    fake derives it from the payload hash; a real decoder computes it from
    samples inside the same kernel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                if payload is None:
                    rows.append((mid, 0, "", 0.0, 0.0))
                    continue
                h = hashlib.md5(payload).digest()  # noqa: S324 — fake decode
                rows.append((
                    mid, len(payload),
                    hashlib.sha256(payload).hexdigest(),
                    round(len(payload) / bytes_per_second, 6),
                    round(h[3] / 255.0, 6),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_bytes", "sha", "duration_s", "rms"])

    return df.mapInPandas(run, schema=AUDIO_FEATURES_DDL)


def frame_sample_plan(df: DataFrame, every_n_seconds: int = 10,
                      duration_col: str = "duration_s") -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to extract —
    the explode is native; only the (stubbed) frame decode would be Python.
    """
    n_frames = (F.col(duration_col) / every_n_seconds).cast("int")
    return df.withColumn(
        "frame_ts",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
            lambda i: i * every_n_seconds,
        )),
    )
