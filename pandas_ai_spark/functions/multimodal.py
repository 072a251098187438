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
the fake. Video DEMUX is real since r13 — a pure-python ISO-BMFF
(MP4, ISO/IEC 14496-12) box parser (``mp4_parse`` /
``mp4_sample_ranges`` / ``probe_video``) recovers movie/track metadata
and byte-exact per-sample payloads from the stsz/stsc/stco tables;
only the codec DECODE step (pixels from bitstream) remains stubbed.

Operators:
- ``attach_media_metadata``    — typed metadata struct from the binary
- ``decode_image`` / ``extract_image_features`` / ``resize_image``
- ``probe_video``              — real ISO-BMFF container probe
- ``sample_video_frames``      — real MP4 sample demux ('fake' keeps
  the deterministic stand-in; ``build_mp4`` synthesizes valid
  containers for round-trip verification)
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


# ---------------------------------------------------------------------------
# Video: pure-python ISO-BMFF (MP4, ISO/IEC 14496-12) DEMUX — container
# box walk, sample tables (stsz/stsc/stco), track metadata. Frame DECODE
# (the codec step) stays stubbed: demuxed samples are still-encoded
# bitstream payloads. No external binary or library required.
# ---------------------------------------------------------------------------

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
_MP4_UNITY_MATRIX = b"".join(
    v.to_bytes(4, "big")
    for v in (0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000))


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield ``(fourcc, payload_start, box_end)`` for the sibling boxes
    in ``buf[start:end]``; stops (never raises) on a corrupt size."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(buf[off:off + 4], "big")
        typ = buf[off + 4:off + 8]
        if size == 1:
            if off + 16 > end:
                return
            size = int.from_bytes(buf[off + 8:off + 16], "big")
            payload = off + 16
        elif size == 0:
            size = end - off
            payload = off + 8
        else:
            payload = off + 8
        box_end = off + size
        if box_end > end or box_end <= off or payload > box_end:
            return
        yield typ, payload, box_end
        off = box_end


def mp4_parse(blob: bytes) -> "dict | None":
    """Parse an ISO-BMFF container into movie + per-track metadata and
    sample tables, or ``None`` when the blob is not ISO-BMFF (no valid
    top-level ``ftyp``/``moov`` walk). Pure python over the public box
    grammar (ISO/IEC 14496-12) — no decoding, no dependencies.

    Hardened against hostile/corrupt blobs: every sample-table entry
    count is clamped to the bytes actually present in its box (a
    declared stsz/stco count of 2^32-1 cannot allocate past the blob),
    and any residual malformed-structure error degrades to ``None``
    (caller contract: not-MP4, never a failed Spark task)."""
    try:
        return _mp4_parse_unchecked(blob)
    except Exception:
        return None


def _mp4_parse_unchecked(blob: bytes) -> "dict | None":
    if blob is None or len(blob) < 16:
        return None
    info = {"brand": None, "timescale": None, "duration": None,
            "tracks": []}
    top = list(_iter_boxes(blob, 0, len(blob)))
    if not any(t == b"ftyp" for t, _, _ in top) \
            or not any(t == b"moov" for t, _, _ in top):
        return None

    def walk_track(buf, s, e):
        trk = {"handler": None, "width": None, "height": None,
               "codec": None, "timescale": None, "duration": None,
               "sample_sizes": [], "chunk_offsets": [], "stsc": []}

        def rec(s2, e2):
            for typ, p, be in _iter_boxes(buf, s2, e2):
                if typ in _MP4_CONTAINERS:
                    rec(p, be)
                elif typ == b"tkhd":
                    ver = buf[p]
                    base = p + 4 + (32 if ver == 1 else 20) + 52
                    trk["width"] = int.from_bytes(
                        buf[base:base + 4], "big") >> 16
                    trk["height"] = int.from_bytes(
                        buf[base + 4:base + 8], "big") >> 16
                elif typ == b"mdhd":
                    ver = buf[p]
                    if ver == 1:
                        trk["timescale"] = int.from_bytes(
                            buf[p + 20:p + 24], "big")
                        trk["duration"] = int.from_bytes(
                            buf[p + 24:p + 32], "big")
                    else:
                        trk["timescale"] = int.from_bytes(
                            buf[p + 12:p + 16], "big")
                        trk["duration"] = int.from_bytes(
                            buf[p + 16:p + 20], "big")
                elif typ == b"hdlr":
                    trk["handler"] = buf[p + 8:p + 12].decode(
                        "ascii", "replace")
                elif typ == b"stsd":
                    n = int.from_bytes(buf[p + 4:p + 8], "big")
                    if n >= 1 and p + 16 <= be:
                        trk["codec"] = buf[p + 12:p + 16].decode(
                            "ascii", "replace")
                elif typ == b"stsz":
                    fixed = int.from_bytes(buf[p + 4:p + 8], "big")
                    cnt = int.from_bytes(buf[p + 8:p + 12], "big")
                    if fixed:
                        # Fixed-size path carries no table bytes to
                        # clamp against; samples live inside this blob,
                        # so the count can never exceed blob_len/size.
                        cnt = min(cnt, len(buf) // max(fixed, 1) + 1)
                        trk["sample_sizes"] = [fixed] * cnt
                    else:
                        cnt = min(cnt, max(0, (be - p - 12) // 4))
                        trk["sample_sizes"] = [
                            int.from_bytes(
                                buf[p + 12 + 4 * i:p + 16 + 4 * i],
                                "big")
                            for i in range(cnt)]
                elif typ == b"stco":
                    cnt = int.from_bytes(buf[p + 4:p + 8], "big")
                    cnt = min(cnt, max(0, (be - p - 8) // 4))
                    trk["chunk_offsets"] = [
                        int.from_bytes(
                            buf[p + 8 + 4 * i:p + 12 + 4 * i], "big")
                        for i in range(cnt)]
                elif typ == b"co64":
                    cnt = int.from_bytes(buf[p + 4:p + 8], "big")
                    cnt = min(cnt, max(0, (be - p - 8) // 8))
                    trk["chunk_offsets"] = [
                        int.from_bytes(
                            buf[p + 8 + 8 * i:p + 16 + 8 * i], "big")
                        for i in range(cnt)]
                elif typ == b"stsc":
                    cnt = int.from_bytes(buf[p + 4:p + 8], "big")
                    cnt = min(cnt, max(0, (be - p - 8) // 12))
                    trk["stsc"] = [
                        tuple(int.from_bytes(
                            buf[p + 8 + 12 * i + 4 * j:
                                p + 12 + 12 * i + 4 * j], "big")
                            for j in range(3))
                        for i in range(cnt)]

        rec(s, e)
        return trk

    for typ, p, be in top:
        if typ == b"ftyp":
            info["brand"] = blob[p:p + 4].decode("ascii", "replace")
        elif typ == b"moov":
            for t2, p2, be2 in _iter_boxes(blob, p, be):
                if t2 == b"mvhd":
                    ver = blob[p2]
                    if ver == 1:
                        info["timescale"] = int.from_bytes(
                            blob[p2 + 20:p2 + 24], "big")
                        info["duration"] = int.from_bytes(
                            blob[p2 + 24:p2 + 32], "big")
                    else:
                        info["timescale"] = int.from_bytes(
                            blob[p2 + 12:p2 + 16], "big")
                        info["duration"] = int.from_bytes(
                            blob[p2 + 16:p2 + 20], "big")
                elif t2 == b"trak":
                    info["tracks"].append(walk_track(blob, p2, be2))
    return info


def mp4_sample_ranges(track: dict) -> "list[tuple[int, int]]":
    """Per-sample ``(byte_offset, size)`` from a track's sample tables —
    the general stsc chunk-run mapping (a chunk run covers chunks
    ``first..next_first-1`` at ``samples_per_chunk`` each), offsets
    advanced by stsz within each chunk."""
    stsc = track.get("stsc") or []
    stco = track.get("chunk_offsets") or []
    sizes = track.get("sample_sizes") or []
    out: "list[tuple[int, int]]" = []
    si = 0
    for i, (first, spc, _desc) in enumerate(stsc):
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else len(stco)
        for chunk in range(first, last + 1):
            if chunk - 1 >= len(stco):
                return out
            off = stco[chunk - 1]
            for _ in range(spc):
                if si >= len(sizes):
                    return out
                out.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return out


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + typ + payload


def _mp4_full(typ: bytes, version: int, flags: int,
              body: bytes) -> bytes:
    return _mp4_box(typ, bytes([version]) + flags.to_bytes(3, "big")
                    + body)


def build_mp4(frames: "list[bytes]", width: int, height: int,
              duration_ms: int, codec: bytes = b"mp4v") -> bytes:
    """Assemble a minimal VALID single-video-track ISO-BMFF container
    around pre-encoded ``frames`` payloads (ftyp + moov with full
    sample tables + mdat). The deterministic synthesizer the round-trip
    oracles use: :func:`mp4_parse` / :func:`mp4_sample_ranges` must
    recover exactly the metadata and payloads given here, and a SQL
    oracle can predict both from the generating parameters."""
    n = len(frames)
    timescale = 1000
    u32, u16 = ((lambda v: int(v).to_bytes(4, "big")),
                (lambda v: int(v).to_bytes(2, "big")))
    ftyp = _mp4_box(b"ftyp", b"isom" + u32(0) + b"isom")
    mvhd = _mp4_full(b"mvhd", 0, 0,
                     u32(0) + u32(0) + u32(timescale)
                     + u32(duration_ms) + u32(0x00010000) + u16(0x0100)
                     + bytes(10) + _MP4_UNITY_MATRIX + bytes(24)
                     + u32(2))
    tkhd = _mp4_full(b"tkhd", 0, 7,
                     u32(0) + u32(0) + u32(1) + bytes(4)
                     + u32(duration_ms) + bytes(8) + u16(0) + u16(0)
                     + u16(0) + bytes(2) + _MP4_UNITY_MATRIX
                     + u32(width << 16) + u32(height << 16))
    mdhd = _mp4_full(b"mdhd", 0, 0,
                     u32(0) + u32(0) + u32(timescale)
                     + u32(duration_ms) + u16(0x55C4) + u16(0))
    hdlr = _mp4_full(b"hdlr", 0, 0,
                     u32(0) + b"vide" + bytes(12) + b"\x00")
    vmhd = _mp4_full(b"vmhd", 0, 1, u16(0) + bytes(6))
    dref = _mp4_full(b"dref", 0, 0,
                     u32(1) + _mp4_full(b"url ", 0, 1, b""))
    dinf = _mp4_box(b"dinf", dref)
    entry = (u32(86) + codec + bytes(6) + u16(1) + u16(0) + u16(0)
             + bytes(12) + u16(width) + u16(height) + u32(0x00480000)
             + u32(0x00480000) + u32(0) + u16(1) + bytes(32) + u16(24)
             + u16(0xFFFF))
    stsd = _mp4_full(b"stsd", 0, 0, u32(1) + entry)
    delta = max(1, duration_ms // max(n, 1))
    stts = _mp4_full(b"stts", 0, 0, u32(1) + u32(n) + u32(delta))
    stsc = _mp4_full(b"stsc", 0, 0, u32(1) + u32(1) + u32(n) + u32(1))
    stsz = _mp4_full(b"stsz", 0, 0,
                     u32(0) + u32(n)
                     + b"".join(u32(len(f)) for f in frames))

    def assemble(chunk_off: int) -> bytes:
        stco = _mp4_full(b"stco", 0, 0, u32(1) + u32(chunk_off))
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _mp4_box(b"minf", vmhd + dinf + stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        trak = _mp4_box(b"trak", tkhd + mdia)
        moov = _mp4_box(b"moov", mvhd + trak)
        return ftyp + moov

    head = assemble(0)
    head = assemble(len(head) + 8)  # mdat payload starts after header
    return head + _mp4_box(b"mdat", b"".join(frames))


def probe_video(df: DataFrame, blob_col: str = "media",
                id_col: str = "doc_id") -> DataFrame:
    """Real container-level video probe: one row per blob with movie
    duration, track count, and the video track's dimensions / codec /
    frame count — demuxed by :func:`mp4_parse` (pure-python ISO-BMFF
    box walk, no external binary). Non-MP4 blobs report
    ``is_mp4=false`` with NULL metadata. mapInPandas Arrow streaming,
    same scale shape as the image/audio operators."""
    out_schema = (f"{id_col} bigint, is_mp4 boolean, duration_sec "
                  "double, n_tracks int, width int, height int, "
                  "codec string, video_frames int")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (id_col, "is_mp4", "duration_sec",
                                    "n_tracks", "width", "height",
                                    "codec", "video_frames")}
            for rid, rblob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(rblob) if rblob is not None else b""
                info = mp4_parse(blob)
                rows[id_col].append(rid)
                if info is None:
                    rows["is_mp4"].append(False)
                    for k in ("duration_sec", "n_tracks", "width",
                              "height", "codec", "video_frames"):
                        rows[k].append(None)
                    continue
                vid = next((t for t in info["tracks"]
                            if t["handler"] == "vide"), None)
                rows["is_mp4"].append(True)
                ts = info["timescale"] or 0
                rows["duration_sec"].append(
                    info["duration"] / ts if ts else None)
                rows["n_tracks"].append(len(info["tracks"]))
                rows["width"].append(vid["width"] if vid else None)
                rows["height"].append(vid["height"] if vid else None)
                rows["codec"].append(vid["codec"] if vid else None)
                rows["video_frames"].append(
                    len(vid["sample_sizes"]) if vid else None)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(op, out_schema)


def sample_video_frames(df: DataFrame, blob_col: str = "media",
                        id_col: str = "doc_id",
                        every_n: int = 10,
                        decoder: str = "auto") -> DataFrame:
    """Frame sampling: one output row per sampled frame index.

    ``decoder='real'`` DEMUXES ISO-BMFF containers with
    :func:`mp4_parse` + :func:`mp4_sample_ranges` — the emitted frames
    are the true per-sample bitstream payloads located via
    stsz/stsc/stco (still codec-encoded: pixel DECODE would need a
    codec library and stays out of scope; raises DecoderUnavailable on
    non-MP4 blobs). ``'fake'`` keeps the deterministic stand-in
    (64-byte pseudo-frames from blob length). ``'auto'`` demuxes blobs
    that parse as MP4 and falls back to the fake otherwise (unless the
    USE_REAL_DECODERS back-compat flag demands the real path).
    """
    out_schema = f"{id_col} bigint, frame_idx int, frame binary"
    want_real = decoder == "real"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "frame_idx": [], "frame": []}
            for rid, rblob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(rblob) if rblob is not None else b""
                info = (mp4_parse(blob)
                        if decoder != "fake" else None)
                if info is None and (want_real or USE_REAL_DECODERS):
                    raise DecoderUnavailable(
                        "real video demux needs an ISO-BMFF (MP4) blob"
                        " (decoder='fake' runs the deterministic"
                        " stand-in)")
                if info is not None:
                    vid = next((t for t in info["tracks"]
                                if t["handler"] == "vide"), None)
                    ranges = mp4_sample_ranges(vid) if vid else []
                    for i in range(0, len(ranges), every_n):
                        off, size = ranges[i]
                        rows[id_col].append(rid)
                        rows["frame_idx"].append(i)
                        rows["frame"].append(blob[off:off + size])
                    continue
                n_frames = max(1, len(blob) // 64)
                for i in range(0, n_frames, every_n):
                    rows[id_col].append(rid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(blob[i * 64:(i + 1) * 64])
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(op, out_schema)


def _fake_decode_pixels(payload: bytes, width: int,
                        height: int) -> bytes:
    """Deterministic stand-in for codec pixel decode: tile the encoded
    payload bytes into a width×height×3 RGB plane. Depends only on
    payload content and the declared geometry, so a SQL oracle can
    predict it from the generating parameters."""
    need = max(width, 1) * max(height, 1) * 3
    src = payload if payload else b"\x00"
    reps = need // len(src) + 1
    return (src * reps)[:need]


def decode_video_frames(df: DataFrame, blob_col: str = "media",
                        id_col: str = "doc_id", every_n: int = 10,
                        decoder: str = "auto") -> DataFrame:
    """The codec stage behind :func:`sample_video_frames`: demux an
    ISO-BMFF blob with :func:`mp4_parse`/:func:`mp4_sample_ranges`,
    then DECODE sampled frames to RGB pixel planes — one output row per
    sampled frame: ``(id, frame_idx, width, height, pixels binary)``
    (rgb24, ``width*height*3`` bytes).

    ``decoder='real'`` requires PyAV (import-gated; raises
    :class:`DecoderUnavailable` with the install hint when absent) and
    runs the blob through ``av.open`` — true codec decode.
    ``'fake'`` demuxes for geometry + payload (the real box walk) and
    tiles each still-encoded sample payload into the pixel plane
    (:func:`_fake_decode_pixels`) — deterministic, oracle-predictable.
    ``'auto'`` decodes with PyAV when importable AND the blob decodes,
    falling back to the fake per blob. Same Arrow ``mapInPandas``
    plumbing as the sibling stages: batch-at-a-time, schema fixed, no
    driver collect.
    """
    out_schema = (f"{id_col} bigint, frame_idx int, width int, "
                  "height int, pixels binary")
    want_real = decoder == "real" or USE_REAL_DECODERS
    if want_real:
        try:
            import av  # noqa: F401
        except ImportError:
            raise DecoderUnavailable(
                "real video pixel decode requires PyAV — pip install "
                "av (decoder='fake' tiles demuxed payloads "
                "deterministically)")

    def _real_rows(blob: bytes, rid, rows) -> bool:
        try:
            import io

            import av
        except ImportError:
            return False
        try:
            with av.open(io.BytesIO(blob)) as container:
                stream = next(
                    (s for s in container.streams if s.type == "video"),
                    None)
                if stream is None:
                    return False
                for i, frame in enumerate(container.decode(stream)):
                    if i % every_n:
                        continue
                    arr = frame.to_ndarray(format="rgb24")
                    rows[id_col].append(rid)
                    rows["frame_idx"].append(i)
                    rows["width"].append(arr.shape[1])
                    rows["height"].append(arr.shape[0])
                    rows["pixels"].append(arr.tobytes())
            return True
        except Exception:
            if want_real:
                raise
            return False

    # Arrow caps a single array at 2 GiB; a batch of decoded planes
    # crosses that fast (one 320x240 rgb24 plane is ~230 KB). Flush
    # the output in sub-batches bounded by accumulated pixel bytes so
    # every yielded frame stays one Arrow RecordBatch.
    _FLUSH_BYTES = 64 << 20

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "frame_idx": [], "width": [],
                    "height": [], "pixels": []}
            acc = 0
            for rid, rblob in zip(pdf[id_col], pdf[blob_col]):
                if acc >= _FLUSH_BYTES:
                    yield pd.DataFrame(rows)
                    rows = {id_col: [], "frame_idx": [], "width": [],
                            "height": [], "pixels": []}
                    acc = 0
                blob = bytes(rblob) if rblob is not None else b""
                if decoder != "fake" and _real_rows(blob, rid, rows):
                    acc += sum(len(p) for p in rows["pixels"][-8:])
                    continue
                if want_real:
                    raise DecoderUnavailable(
                        "real video pixel decode failed for a blob "
                        "(decoder='fake' tiles demuxed payloads)")
                info = mp4_parse(blob)
                if info is None:
                    continue  # not ISO-BMFF → no frames
                vid = next((t for t in info["tracks"]
                            if t["handler"] == "vide"), None)
                if vid is None:
                    continue
                w = int(vid["width"] or 0)
                h = int(vid["height"] or 0)
                for i, (off, size) in enumerate(
                        mp4_sample_ranges(vid)):
                    if i % every_n:
                        continue
                    px = _fake_decode_pixels(blob[off:off + size],
                                             w, h)
                    rows[id_col].append(rid)
                    rows["frame_idx"].append(i)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["pixels"].append(px)
                    acc += len(px)
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
