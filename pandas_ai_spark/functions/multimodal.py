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
- ``audio_windows`` / ``extract_audio_features`` — PCM framing + clip
  features (RMS / zero-crossing / duration)
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


def _fake_decode_audio(blob: bytes, sample_rate: int = 16_000) -> np.ndarray:
    """Deterministic fake PCM decode: blob bytes → float32 waveform in
    [−1, 1]. Stands in for torchaudio/soundfile; output depends only on
    blob content, duration scales with blob length (1 'sample' per
    byte) so windowing math is exercised realistically."""
    if blob is None or len(blob) == 0:
        raise DecoderUnavailable("empty blob")
    arr = np.frombuffer(blob, dtype=np.uint8).astype(np.float32)
    return (arr - 127.5) / 127.5


def audio_windows(df: DataFrame, blob_col: str = "media",
                  id_col: str = "doc_id", window: int = 400,
                  hop: int = 160) -> DataFrame:
    """Audio framing plumbing: decode → fixed-size windows every ``hop``
    samples (the STFT/feature frame layout) — one output row per
    window, PCM re-encoded as float32 bytes. Real impl swaps the
    decoder; window/hop/batch shapes are identical.

    Scale shape: mapInPandas streams Arrow batches; output rows explode
    by ~duration/hop per clip but stay within the task — no shuffle.
    """
    if hop <= 0 or window <= 0 or hop > window:
        raise ValueError("need 0 < hop <= window")
    out_schema = f"{id_col} bigint, window_idx int, start_sample int, pcm binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if USE_REAL_DECODERS:
            raise DecoderUnavailable("real audio decode requires "
                                     "soundfile/torchaudio")
        for pdf in batches:
            rows = {id_col: [], "window_idx": [], "start_sample": [],
                    "pcm": []}
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    continue
                wave = _fake_decode_audio(bytes(blob))
                n = len(wave)
                starts = range(0, max(n - window, 0) + 1, hop) \
                    if n >= window else [0]
                for w_i, s in enumerate(starts):
                    rows[id_col].append(row[id_col])
                    rows["window_idx"].append(w_i)
                    rows["start_sample"].append(s)
                    rows["pcm"].append(wave[s:s + window].tobytes())
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(op, out_schema)


def extract_audio_features(df: DataFrame, blob_col: str = "media",
                           id_col: str = "doc_id") -> DataFrame:
    """Per-clip audio features (RMS energy, zero-crossing rate,
    duration proxy) from the decoded waveform — the numeric columns a
    speech-corpus filter keys on. Same Arrow-batched shape as
    extract_image_features."""
    out_schema = (f"{id_col} bigint, rms double, zcr double, "
                  f"n_samples bigint")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if USE_REAL_DECODERS:
            raise DecoderUnavailable("real audio decode requires "
                                     "soundfile/torchaudio")
        for pdf in batches:
            rms, zcr, ns = [], [], []
            for b in pdf[blob_col]:
                if b is None:
                    rms.append(None); zcr.append(None); ns.append(None)
                    continue
                w = _fake_decode_audio(bytes(b))
                rms.append(float(np.sqrt(np.mean(w * w))))
                zcr.append(float(np.mean(np.signbit(w[1:])
                                         != np.signbit(w[:-1]))))
                ns.append(len(w))
            yield pd.DataFrame({id_col: pdf[id_col], "rms": rms,
                                "zcr": zcr, "n_samples": ns})

    return df.select(id_col, blob_col).mapInPandas(op, out_schema)
