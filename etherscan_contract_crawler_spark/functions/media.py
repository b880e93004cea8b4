"""Multimodal (audio / video) columns: typed metadata + opaque bytes, with
decode / feature-extract / frame-sample / resize as Arrow-batched operators.

Contract (per the training-pipeline mandate): media rides as an opaque
``binary`` column next to typed metadata; every transformation is a
``mapInPandas`` over Arrow batches — bytes cross the Python boundary once
per stage and never enter a shuffle wider than their own row. The
*codec* layer is swappable:

  * ``fmt='synth'`` — a deterministic fake codec (payload derived from
    sha1(media_id) like the image plane's synthetic generator): REAL numpy
    decode, real features, fully tested. This is the sandbox stand-in.
  * real formats (wav/mp3/mp4/…) — the decode hook raises a clearly-marked
    ``NotImplementedError`` unless the optional libs (soundfile / av) are
    importable; the container ships neither, so the plumbing (schemas, UDF
    signatures, batch shapes, partitioning) is what this module proves.

Image resize is the exception: the repo has a real pure-numpy PNG codec
(functions/images.py), so ``resize_images`` is a REAL end-to-end transform
(decode → nearest-neighbor resample → re-encode), no stub anywhere.

Batch-shape note: payload rows are large; callers should keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small enough that one
Arrow batch of bytes fits comfortably in worker memory (the engine session
default handles this; see session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_DDL = (
    "media_id string, bytes binary, fmt string, sample_rate int, "
    "n_channels int, n_samples int"
)
AUDIO_FEATURES_DDL = (
    "media_id string, n_samples int, rms double, zero_cross_rate double, "
    "clip_fraction double"
)
VIDEO_DDL = (
    "media_id string, bytes binary, fmt string, w int, h int, fps double, n_frames int"
)
FRAME_DDL = "media_id string, frame_idx int, w int, h int, frame_bytes binary"


def _synth_rng(media_id: str) -> np.random.Generator:
    seed = int(hashlib.sha1(media_id.encode()).hexdigest()[:12], 16)
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- audio
def synth_audio_payload(media_id: str, n_samples: int = 4000, sample_rate: int = 16000):
    """Deterministic fake clip: int16 mono PCM derived from the id."""
    rng = _synth_rng(media_id)
    t = np.arange(n_samples, dtype=np.float64)
    freq = 100.0 + float(rng.integers(0, 900))
    wave = 0.6 * np.sin(2 * np.pi * freq * t / sample_rate)
    wave += 0.1 * rng.standard_normal(n_samples)
    pcm = np.clip(wave, -1.0, 1.0)
    return (pcm * 32767).astype("<i2").tobytes(), sample_rate, 1, n_samples


def decode_audio(bytes_, fmt: str, n_samples: int) -> np.ndarray:
    """bytes -> float64 mono waveform in [-1, 1]. 'synth' decodes for real
    (it IS little-endian int16 PCM); real container formats need soundfile,
    which this environment does not ship — the guard documents exactly
    where a production deployment plugs in."""
    if fmt == "synth":
        pcm = np.frombuffer(bytes_, dtype="<i2", count=n_samples)
        return pcm.astype(np.float64) / 32767.0
    try:
        import soundfile  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            f"audio fmt {fmt!r} needs the optional 'soundfile' codec; only the "
            "deterministic 'synth' PCM codec ships in this environment"
        ) from e
    raise NotImplementedError(f"audio fmt {fmt!r} decode not wired")  # pragma: no cover


def audio_features(clips: DataFrame) -> DataFrame:
    """Per-clip features (rms, zero-crossing rate, clipped fraction) —
    vectorized numpy per Arrow batch; one decode per clip, no second pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_samples", "rms", "zero_cross_rate", "clip_fraction")}
            for row in pdf.itertuples(index=False):
                w = decode_audio(row.bytes, row.fmt, row.n_samples)
                out["media_id"].append(row.media_id)
                out["n_samples"].append(len(w))
                out["rms"].append(float(np.sqrt(np.mean(w * w))))
                out["zero_cross_rate"].append(
                    float(np.mean(np.signbit(w[1:]) != np.signbit(w[:-1])))
                )
                out["clip_fraction"].append(float(np.mean(np.abs(w) > 0.999)))
            yield pd.DataFrame(out)

    return clips.mapInPandas(run, schema=AUDIO_FEATURES_DDL)


# ---------------------------------------------------------------- video
def synth_video_payload(media_id: str, w: int = 32, h: int = 24, n_frames: int = 12):
    """Deterministic fake video: n_frames raw RGB frames concatenated."""
    rng = _synth_rng(media_id)
    frames = rng.integers(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
    return frames.tobytes(), w, h, 8.0, n_frames


def decode_video_frames(bytes_, fmt: str, w: int, h: int, n_frames: int) -> np.ndarray:
    """bytes -> (n_frames, h, w, 3) uint8. 'synth' is raw RGB (real decode);
    container formats need PyAV — absent here, guard marks the plug point."""
    if fmt == "synth":
        return np.frombuffer(bytes_, dtype=np.uint8, count=n_frames * h * w * 3).reshape(
            n_frames, h, w, 3
        )
    try:
        import av  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            f"video fmt {fmt!r} needs the optional 'av' codec; only the "
            "deterministic 'synth' raw-RGB codec ships in this environment"
        ) from e
    raise NotImplementedError(f"video fmt {fmt!r} decode not wired")  # pragma: no cover


def sample_frames(videos: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: one output row per kept frame (media_id, frame_idx,
    frame bytes). The expansion happens INSIDE the Arrow batch — no
    explode-shuffle of payload bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "w", "h", "frame_bytes")}
            for row in pdf.itertuples(index=False):
                frames = decode_video_frames(row.bytes, row.fmt, row.w, row.h, row.n_frames)
                for idx in range(0, row.n_frames, every_n):
                    out["media_id"].append(row.media_id)
                    out["frame_idx"].append(idx)
                    out["w"].append(row.w)
                    out["h"].append(row.h)
                    out["frame_bytes"].append(frames[idx].tobytes())
            yield pd.DataFrame(out)

    return videos.mapInPandas(run, schema=FRAME_DDL)


# ---------------------------------------------------------------- images
def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL end-to-end image resize: PNG decode (pure numpy codec) →
    nearest-neighbor resample → PNG re-encode. Non-PNG rows pass through
    with resized=false (the lossy codec is PIL-gated elsewhere)."""
    from .images import decode_image, encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "resized")}
            for row in pdf.itertuples(index=False):
                out["image_id"].append(row.image_id)
                if row.fmt != "png":
                    out["bytes"].append(row.bytes)
                    out["w"].append(row.w)
                    out["h"].append(row.h)
                    out["fmt"].append(row.fmt)
                    out["resized"].append(False)
                    continue
                px = decode_image(row.bytes)
                h, w = px.shape[:2]
                xs = (np.arange(out_w) * w) // out_w
                ys = (np.arange(out_h) * h) // out_h
                resized = px[ys][:, xs]
                out["bytes"].append(encode_png(resized))
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append("png")
                out["resized"].append(True)
            yield pd.DataFrame(out)

    return images.mapInPandas(
        run, schema="image_id string, bytes binary, w int, h int, fmt string, resized boolean"
    )


#: (uppercase-hex magic prefix, mime) in precedence order; RIFF containers
#: are disambiguated by the format tag at bytes 9-12 (hex chars 17-24)
MAGIC_MIME = [
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("1F8B", "application/gzip"),
    # the sandbox's deterministic lossy stand-in codec (functions/images.py
    # _QJPG_MAGIC) — registered so the curation pipeline's MIME gate treats
    # synth lossy payloads as images, the way a production table would
    # carry real JPEG magic
    ("514A5047", "image/qjpg"),
]


def sniff_mime(bytes_col):
    """Magic-byte MIME sniffing over a binary payload column — the crawler
    gate that catches servers lying in Content-Type (an 'image/png' that is
    really an HTML error page, a .jpg that is a tracking GIF). Mirrors the
    reference's implicit trust of the declared type at fetch time
    (reference: export_contracts.py writes by extension) with the check a
    100 TB pipeline actually needs before paying decode cost.

    Pure projection: one ``hex(substring(bytes, 1, 20))`` then literal
    prefix tests — whole-stage codegen, zero shuffles, no UDF. RIFF
    containers check the format tag at byte offset 9-12 (WEBP vs WAV/AVI);
    a leading '<' (after optional UTF-8 BOM) sniffs as text/html.
    """
    from pyspark.sql import functions as F

    h = F.hex(F.substring(bytes_col, 1, 20))
    out = None
    for magic, mime in MAGIC_MIME:
        cond = h.startswith(magic)
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    riff = h.startswith("52494646")
    tag = F.substring(h, 17, 8)
    out = (
        out.when(riff & (tag == F.lit("57454250")), "image/webp")
        .when(riff & (tag == F.lit("57415645")), "audio/wav")
        .when(riff & (tag == F.lit("41564920")), "video/avi")
        .when(h.startswith("3C"), "text/html")
        .when(h.startswith("EFBBBF3C"), "text/html")
    )
    return out.otherwise("application/octet-stream")
