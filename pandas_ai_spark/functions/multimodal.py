"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as ``binary`` columns with a metadata struct
(mime, width/height/duration, codec), exactly how petabyte-scale training
pipelines store them in parquet. The Spark-side plumbing — schemas,
partition-aware batch iteration, Arrow batch shapes, UDF signatures — is
real and tested; the actual decode (PIL/ffmpeg/torchaudio are not in this
container) is stubbed behind ``DecoderUnavailable`` with a deterministic
fake used by tests.

Operators:
- ``attach_media_metadata``    — typed metadata struct from the binary
- ``decode_image`` / ``extract_image_features`` / ``resize_image``
- ``sample_video_frames``      — frame-index plumbing
All heavy ops run through ``mapInPandas`` so each task streams Arrow
record batches — bounded memory regardless of per-row blob size; at scale
you repartition by size so one task ≈ one memory budget, not one file.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DecoderUnavailable(NotImplementedError):
    """Raised when a real media decoder is required but absent."""


#: Flip to use real decoders when PIL/ffmpeg are installed.
USE_REAL_DECODERS = False

MEDIA_META_SCHEMA = (
    "mime string, byte_len bigint, width int, height int, "
    "duration_s double, codec string"
)


def _fake_decode_image(blob: bytes) -> np.ndarray:
    """Deterministic fake decode: blob bytes → pseudo-pixel grid.

    Stands in for PIL so the batch shapes / memory behavior of the real
    pipeline are exercised; output depends only on blob content.
    """
    if blob is None or len(blob) == 0:
        raise DecoderUnavailable("empty blob")
    side = max(2, min(16, int(len(blob) ** 0.5)))
    arr = np.frombuffer(blob, dtype=np.uint8)
    need = side * side * 3
    reps = (need + len(arr) - 1) // len(arr)
    return np.tile(arr, reps)[:need].reshape(side, side, 3)


def decode_image_batch(pdf: pd.DataFrame, blob_col: str) -> pd.Series:
    if USE_REAL_DECODERS:
        raise DecoderUnavailable(
            "real image decode requires PIL — install pillow and implement "
            "here; the fake path exercises identical plumbing")
    return pdf[blob_col].map(
        lambda b: _fake_decode_image(bytes(b)) if b is not None else None)


def attach_media_metadata(df: DataFrame, blob_col: str = "media",
                          mime: str = "image/unknown") -> DataFrame:
    """Typed metadata struct derived from the binary column (JVM-side —
    byte length etc. need no decode)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(F.col(blob_col)).alias("byte_len"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
            F.lit(None).cast("string").alias("codec"),
        ),
    )


def extract_image_features(df: DataFrame, blob_col: str = "media",
                           id_col: str = "doc_id") -> DataFrame:
    """Per-image feature vector (mean RGB + size stats) via mapInPandas.

    Output schema: id, feat array<double>. Batches stream through Arrow;
    memory is bounded by the batch size, not the partition size.
    """
    out_schema = f"{id_col} bigint, feat array<double>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf, blob_col)
            feats = imgs.map(
                lambda a: None if a is None else [
                    float(a[..., 0].mean()), float(a[..., 1].mean()),
                    float(a[..., 2].mean()), float(a.shape[0]),
                    float(a.shape[1]),
                ]
            )
            yield pd.DataFrame({id_col: pdf[id_col], "feat": feats})

    return df.select(id_col, blob_col).mapInPandas(op, out_schema)


def resize_image(df: DataFrame, blob_col: str = "media",
                 id_col: str = "doc_id", size: int = 8) -> DataFrame:
    """Resize plumbing: decode → nearest-neighbor downsample → re-encode
    (fake codec = raw bytes). Real impl swaps the three inner calls."""
    out_schema = f"{id_col} bigint, resized binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf, blob_col)

            def _resize(a):
                if a is None:
                    return None
                ys = np.linspace(0, a.shape[0] - 1, size).astype(int)
                xs = np.linspace(0, a.shape[1] - 1, size).astype(int)
                return a[np.ix_(ys, xs)].tobytes()

            yield pd.DataFrame(
                {id_col: pdf[id_col], "resized": imgs.map(_resize)})

    return df.select(id_col, blob_col).mapInPandas(op, out_schema)


def sample_video_frames(df: DataFrame, blob_col: str = "media",
                        id_col: str = "doc_id",
                        every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    Real impl would demux with ffmpeg per batch; the stub derives a fake
    frame count from blob length so the explode/batch shape is exercised.
    """
    out_schema = f"{id_col} bigint, frame_idx int, frame binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if USE_REAL_DECODERS:
            raise DecoderUnavailable("video demux requires ffmpeg")
        for pdf in batches:
            rows = {id_col: [], "frame_idx": [], "frame": []}
            for _, row in pdf.iterrows():
                blob = bytes(row[blob_col]) if row[blob_col] is not None else b""
                n_frames = max(1, len(blob) // 64)
                for i in range(0, n_frames, every_n):
                    rows[id_col].append(row[id_col])
                    rows["frame_idx"].append(i)
                    rows["frame"].append(blob[i * 64:(i + 1) * 64])
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(op, out_schema)
