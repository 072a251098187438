"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as ``binary`` columns with a metadata struct
(mime, width/height/duration, codec), exactly how petabyte-scale training
pipelines store them in parquet. The Spark-side plumbing — schemas,
partition-aware batch iteration, Arrow batch shapes, UDF signatures — is
real and tested. Decoding is import-gated per operator via the
``decoder`` argument: ``'real'`` uses PIL for images and
soundfile/stdlib-``wave`` for audio (raising ``DecoderUnavailable``
when no real decoder can serve the blob), ``'fake'`` runs the
deterministic stand-in (used by the DuckDB-oracled entry queries, whose
blobs are synthesized text, and available anywhere), and ``'auto'``
picks the real path when the library/format allows and falls back to
the fake. Video demux (ffmpeg, an external binary) remains a documented
stub.

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


#: Back-compat module flag: when True, ``decoder="auto"`` behaves like
#: ``decoder="real"`` (fail loudly instead of falling back to the fake).
USE_REAL_DECODERS = False


def _pil_decode_image(blob: bytes) -> np.ndarray:
    """Real image decode via PIL → HxWx3 uint8 RGB array."""
    import io as _io

    from PIL import Image  # noqa: import-gated at call site

    with Image.open(_io.BytesIO(blob)) as im:
        return np.asarray(im.convert("RGB"))


def _stdlib_wav_decode(blob: bytes) -> np.ndarray:
    """Real PCM WAV decode with the stdlib ``wave`` module → float32
    mono waveform in [−1, 1]. Always available — the in-container real
    path for RIFF/WAV clips; soundfile (when installed) covers every
    other container format."""
    import io as _io
    import wave

    with wave.open(_io.BytesIO(blob), "rb") as w:
        n, width, nch = w.getnframes(), w.getsampwidth(), w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
               - 128.0) / 128.0
    else:
        raise DecoderUnavailable(
            f"stdlib WAV path handles 8/16-bit PCM, got width={width}")
    if nch > 1:
        arr = arr.reshape(-1, nch).mean(axis=1)
    return arr


def _soundfile_decode(blob: bytes) -> np.ndarray:
    import io as _io

    import soundfile as sf  # noqa: import-gated at call site

    data, _sr = sf.read(_io.BytesIO(blob), dtype="float32")
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data


def _resolve_image_decoder(decoder: str):
    """'fake' | 'real' | 'auto' → decode callable.

    real: PIL required (raises DecoderUnavailable when missing).
    auto: PIL when importable, else the deterministic fake — unless the
    USE_REAL_DECODERS back-compat flag demands the real path.
    """
    if decoder == "fake":
        return _fake_decode_image
    try:
        import PIL.Image  # noqa: F401
        have = True
    except ImportError:
        have = False
    if decoder == "real" or USE_REAL_DECODERS:
        if not have:
            raise DecoderUnavailable(
                "real image decode requires PIL — pip install pillow "
                "(decoder='fake' runs the deterministic stand-in)")
        return _pil_decode_image
    return _pil_decode_image if have else _fake_decode_image


def _resolve_audio_decoder(decoder: str):
    """'fake' | 'real' | 'auto' → decode callable.

    real: soundfile when installed (any format); otherwise the stdlib
    ``wave`` parser, which handles RIFF/WAV PCM without dependencies.
    auto: the real chain for RIFF blobs / installed soundfile, else the
    deterministic fake.
    """
    if decoder == "fake":
        return _fake_decode_audio
    try:
        import soundfile  # noqa: F401
        return _soundfile_decode
    except ImportError:
        pass
    if decoder == "real" or USE_REAL_DECODERS:
        return _stdlib_wav_decode
    # auto without soundfile: WAVs decode for real, anything else fakes
    def _chain(blob: bytes) -> np.ndarray:
        if blob[:4] == b"RIFF":
            return _stdlib_wav_decode(blob)
        return _fake_decode_audio(blob)
    return _chain

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


def decode_image_batch(pdf: pd.DataFrame, blob_col: str,
                       decoder: str = "auto") -> pd.Series:
    dec = _resolve_image_decoder(decoder)
    return pdf[blob_col].map(
        lambda b: dec(bytes(b)) if b is not None else None)


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
                           id_col: str = "doc_id",
                           decoder: str = "auto") -> DataFrame:
    """Per-image feature vector (mean RGB + size stats) via mapInPandas.

    Output schema: id, feat array<double>. Batches stream through Arrow;
    memory is bounded by the batch size, not the partition size.
    ``decoder``: 'real' (PIL, raises when absent), 'fake' (deterministic
    stand-in), 'auto' (real when importable, else fake).
    """
    out_schema = f"{id_col} bigint, feat array<double>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf, blob_col, decoder)
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
                 id_col: str = "doc_id", size: int = 8,
                 decoder: str = "auto") -> DataFrame:
    """Resize plumbing: decode → nearest-neighbor downsample → re-encode
    (raw RGB bytes out; a real codec swap is the single re-encode call)."""
    out_schema = f"{id_col} bigint, resized binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf, blob_col, decoder)

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
            # no in-process video demuxer exists to gate on — ffmpeg is
            # an external binary; this stays the documented stub
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
                  hop: int = 160, decoder: str = "auto") -> DataFrame:
    """Audio framing: decode → fixed-size windows every ``hop`` samples
    (the STFT/feature frame layout) — one output row per window, PCM
    re-encoded as float32 bytes. ``decoder``: 'real' (soundfile when
    installed, stdlib ``wave`` for RIFF/WAV PCM otherwise), 'fake'
    (deterministic stand-in), 'auto' (real for decodable blobs, fake
    fallback).

    Scale shape: mapInPandas streams Arrow batches; output rows explode
    by ~duration/hop per clip but stay within the task — no shuffle.
    """
    if hop <= 0 or window <= 0 or hop > window:
        raise ValueError("need 0 < hop <= window")
    out_schema = f"{id_col} bigint, window_idx int, start_sample int, pcm binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _resolve_audio_decoder(decoder)
        for pdf in batches:
            rows = {id_col: [], "window_idx": [], "start_sample": [],
                    "pcm": []}
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    continue
                wave = dec(bytes(blob))
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
                           id_col: str = "doc_id",
                           decoder: str = "auto") -> DataFrame:
    """Per-clip audio features (RMS energy, zero-crossing rate,
    duration proxy) from the decoded waveform — the numeric columns a
    speech-corpus filter keys on. Same Arrow-batched shape and
    ``decoder`` contract as :func:`audio_windows`."""
    out_schema = (f"{id_col} bigint, rms double, zcr double, "
                  f"n_samples bigint")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _resolve_audio_decoder(decoder)
        for pdf in batches:
            rms, zcr, ns = [], [], []
            for b in pdf[blob_col]:
                if b is None:
                    rms.append(None); zcr.append(None); ns.append(None)
                    continue
                w = dec(bytes(b))
                rms.append(float(np.sqrt(np.mean(w * w))))
                zcr.append(float(np.mean(np.signbit(w[1:])
                                         != np.signbit(w[:-1]))))
                ns.append(len(w))
            yield pd.DataFrame({id_col: pdf[id_col], "rms": rms,
                                "zcr": zcr, "n_samples": ns})

    return df.select(id_col, blob_col).mapInPandas(op, out_schema)


def perceptual_hash_bands(df: DataFrame, blob_col: str = "media",
                          id_col: str = "doc_id",
                          decoder: str = "auto",
                          grid: int = 8, bands: int = 8) -> DataFrame:
    """Perceptual image hash (aHash family), banded for LSH joins:
    decode → fixed ``grid×grid`` nearest-neighbor downsample →
    grayscale (channel mean) → threshold each cell against the image's
    mean gray → pack the ``grid²`` bits into ``bands`` integer bands.
    Returns ``(id, band array<int>)`` — near-duplicate images share
    bands, so a banded equi-join (the q23 SimHash shape) finds
    candidates without all-pairs comparison; :func:`phash_candidates`
    wires exactly that.

    Decoding runs through the same ``decoder='real'|'fake'|'auto'``
    gate as the other media ops (PIL when present; the deterministic
    fake stand-in keeps CI and the DuckDB oracle runnable without
    codecs). Arrow-batched ``mapInPandas`` — memory bounded by batch
    size.
    """
    if grid * grid % bands != 0:
        raise ValueError("bands must divide grid*grid")
    per = grid * grid // bands
    if per > 31:
        # each band packs `per` bits into the declared array<int>
        # schema — 32+ bits would silently overflow. Suggest the
        # smallest band count that BOTH divides grid² and fits 31
        # bits (a bare ceil(grid²/31) may fail the divisibility check)
        bits = grid * grid
        ok = next(b for b in range(bands + 1, bits + 1)
                  if bits % b == 0 and bits // b <= 31)
        raise ValueError(
            f"grid*grid//bands = {per} bits per band exceeds the"
            f" 31-bit int band width; raise `bands` (>= {ok})")
    out_schema = f"{id_col} bigint, band array<int>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf, blob_col, decoder)

            def _bands(a):
                if a is None:
                    return None
                ys = np.linspace(0, a.shape[0] - 1, grid).astype(int)
                xs = np.linspace(0, a.shape[1] - 1, grid).astype(int)
                # integer arithmetic end-to-end: cell > mean is tested
                # as gsum·grid² > Σ gsum — exact, so an engine replica
                # can never flip a bit on a float-mean tie
                gsum = a[np.ix_(ys, xs)].astype(np.int64).sum(axis=2)
                bits = (gsum * gsum.size > gsum.sum()).ravel()
                return [int(sum(1 << i for i in range(per)
                                if bits[b * per + i]))
                        for b in range(bands)]

            yield pd.DataFrame({id_col: pdf[id_col],
                                "band": imgs.map(_bands)})

    return df.select(id_col, blob_col).mapInPandas(op, out_schema)


def phash_candidates(hashed: DataFrame, id_col: str = "doc_id"
                     ) -> DataFrame:
    """Near-duplicate image candidate pairs from
    :func:`perceptual_hash_bands` output: two images are candidates
    when ANY band matches (banded Hamming LSH — the q23 SimHash
    shape: explode to (band_idx, band_val), equi-join, distinct;
    never an all-pairs comparison)."""
    e = (hashed.select(id_col, F.posexplode("band")
                       .alias("bidx", "bval")))
    a = e.select(F.col(id_col).alias("id_a"), "bidx", "bval")
    b = e.select(F.col(id_col).alias("id_b"), "bidx", "bval")
    return (a.join(b, ["bidx", "bval"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
