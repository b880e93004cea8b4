"""U4 — payload validation: decode + PSNR + caption/phash checks.

input_hint contract: per-row invariant vs the reference generator is
decoded-pixel allclose — exact for lossless, PSNR >= 40 dB for lossy — plus
caption equality. Implemented as ``mapInPandas`` (Arrow batches of binary
payloads; numpy decode inside — no per-row Python at the Spark layer).

The 'reference pixels' come from the deterministic generator keyed by
image_id (sources/synthetic.py payload_for_key) — the sandbox stand-in for
comparing against the reference crawler's stored payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.images import decode_image, phash64, psnr
from ..sources.synthetic import payload_for_key


def _luma_q(px):
    """ITU-R 601 fixed-point luma (//1000, int64) — THE shared quantization
    every decode gate's exactness contract hinges on: one definition so the
    gates can never desynchronize bit-for-bit."""
    return (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000

def validate_payload_row(p: dict) -> bool:
    """Single-payload validation (shared by the fused fetch+validate stage):
    decode bytes, compare against the regenerated reference — exact pixels
    for lossless, PSNR >= 40 dB for lossy, caption + dims + fmt + phash."""
    # lossless path re-hashes the decoded pixels itself — skip the reference
    # phash there (one phash per URL instead of two); lossy still needs it
    ref = payload_for_key(p["image_id"], encode=False, with_phash=p["fmt"] != "png")
    try:
        px = decode_image(p["bytes"])
    except Exception:
        return False
    if px.shape != (p["h"], p["w"], 3) or (p["w"], p["h"]) != (ref["w"], ref["h"]):
        return False
    if p["fmt"] != ref["fmt"] or p["caption"] != ref["caption"]:
        return False
    if p["fmt"] == "png":
        if not np.array_equal(px, ref["_pixels"]) or phash64(px) != p["phash"]:
            return False
    else:
        if psnr(ref["_pixels"], px) < PSNR_GATE_DB or p["phash"] != ref["phash"]:
            return False
    return True


VALIDATION_DDL = (
    "image_id string, dims_ok boolean, fmt_ok boolean, caption_ok boolean, "
    "phash_ok boolean, psnr_db double, pixels_ok boolean, valid boolean"
)

PSNR_GATE_DB = 40.0


def validate_payloads(images: DataFrame) -> DataFrame:
    """(image_id, bytes, w, h, fmt, caption, phash) -> validation verdicts."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "image_id", "dims_ok", "fmt_ok", "caption_ok", "phash_ok",
                "psnr_db", "pixels_ok", "valid")}
            for r in pdf.itertuples(index=False):
                ref = payload_for_key(r.image_id, encode=False)
                try:
                    px = decode_image(bytes(r.bytes))
                    dims_ok = px.shape == (r.h, r.w, 3) and (r.w, r.h) == (ref["w"], ref["h"])
                    p = psnr(ref["_pixels"], px) if px.shape == ref["_pixels"].shape else 0.0
                    pixels_ok = (
                        bool(np.array_equal(px, ref["_pixels"]))
                        if r.fmt == "png"
                        else bool(p >= PSNR_GATE_DB)
                    )
                    phash_ok = phash64(px) == r.phash if r.fmt == "png" else (
                        r.phash == ref["phash"])
                except Exception:
                    dims_ok = pixels_ok = phash_ok = False
                    p = 0.0
                fmt_ok = r.fmt == ref["fmt"]
                caption_ok = r.caption == ref["caption"]
                rows["image_id"].append(r.image_id)
                rows["dims_ok"].append(dims_ok)
                rows["fmt_ok"].append(fmt_ok)
                rows["caption_ok"].append(caption_ok)
                rows["phash_ok"].append(phash_ok)
                rows["psnr_db"].append(float(min(p, 99.0)))
                rows["pixels_ok"].append(pixels_ok)
                rows["valid"].append(
                    dims_ok and fmt_ok and caption_ok and phash_ok and pixels_ok
                )
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash").mapInPandas(
        run, schema=VALIDATION_DDL
    )


CHANNEL_STATS_DDL = (
    "image_id string, mean_r int, mean_g int, mean_b int, "
    "dyn_range int, entropy_q double, flat boolean, keep boolean"
)

#: a decoded image whose max-min pixel spread is below this is "flat"
#: (solid color / tracking pixel / placeholder) — training noise
FLAT_DYN_RANGE = 8
#: minimum quantized 8-bin luma entropy (bits) for a keepable image
MIN_ENTROPY_BITS = 0.5


def channel_stats(images: DataFrame) -> DataFrame:
    """Image-quality gate over DECODED pixels (the LAION-style pre-filter
    that drops solid-color placeholders, tracking pixels, and blank scans
    before any perceptual hashing is paid for): per-channel integer means,
    dynamic range, 8-bin luma entropy, and a keep verdict.

    All statistics are integer- or rational-exact (sums // counts, bin
    counts) so results are bit-identical across partitionings — entropy is
    the only float and is a deterministic function of the 8 bin counts.
    Undecodable payloads surface as NULL-stats rows with keep=false
    (P10 error-to-null), never exceptions.

    Scale shape: ``mapInPandas`` over Arrow batches of binary payloads —
    numpy inside, no per-row Python at the Spark layer, ZERO shuffles;
    the gate composes map-side with fetch/validate in the landing stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "mean_r", "mean_g", "mean_b", "dyn_range",
                "entropy_q", "flat", "keep")}
            for r in pdf.itertuples(index=False):
                out["image_id"].append(r.image_id)
                try:
                    px = decode_image(bytes(r.bytes)).astype(np.int64)
                except Exception:
                    out["mean_r"].append(None)
                    out["mean_g"].append(None)
                    out["mean_b"].append(None)
                    out["dyn_range"].append(None)
                    out["entropy_q"].append(None)
                    out["flat"].append(None)
                    out["keep"].append(False)
                    continue
                n = px.shape[0] * px.shape[1]
                means = [int(px[:, :, c].sum() // n) for c in range(3)]
                dyn = int(px.max() - px.min())
                # integer luma (ITU-R 601 fixed-point), 8-bin histogram
                luma = _luma_q(px)
                bins = np.bincount((luma >> 5).ravel(), minlength=8)[:8]
                p = bins[bins > 0] / n
                ent = float(-(p * np.log2(p)).sum())
                flat = dyn < FLAT_DYN_RANGE
                out["mean_r"].append(means[0])
                out["mean_g"].append(means[1])
                out["mean_b"].append(means[2])
                out["dyn_range"].append(dyn)
                out["entropy_q"].append(round(ent, 6))
                out["flat"].append(flat)
                out["keep"].append(bool(not flat and ent >= MIN_ENTROPY_BITS))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(
        run, schema=CHANNEL_STATS_DDL
    )


BLUR_GATE_DDL = (
    "image_id string, lap_var_q bigint, sharp boolean, keep boolean"
)

#: minimum integer-quantized Laplacian variance for a "sharp" image —
#: calibrated on the synthetic generator: its textured payloads score
#: in the thousands, a 9x box-blurred copy drops ~10x, and a smooth
#: linear gradient scores ~0 (tests/test_images.py pins the ordering)
MIN_LAP_VAR = 100


def blur_gate(images: DataFrame) -> DataFrame:
    """Blur/sharpness gate over DECODED pixels: integer-quantized variance
    of the 3x3 Laplacian of the luma plane (the classic variance-of-
    Laplacian focus measure used by LAION-style image curation to drop
    out-of-focus and interpolation-upscaled images before training).

    Exactness: luma is ITU-R 601 fixed-point (//1000, ints), the Laplacian
    is an integer stencil, and the reported ``lap_var_q`` is the integer
    floor of the population variance computed from integer sums
    ((n*ss - s*s) // (n*n)) — bit-identical across partitionings, so the
    gate is safely rerunnable under AQE/speculative retries.

    Scale shape: identical to :func:`channel_stats` — ``mapInPandas`` over
    Arrow batches, numpy stencil inside, ZERO shuffles; composes map-side
    with fetch/validate in the landing stage. Undecodable or sub-3x3
    payloads surface as NULL-stats rows with keep=false (P10
    error-to-null), never exceptions.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "lap_var_q", "sharp", "keep")}
            for r in pdf.itertuples(index=False):
                out["image_id"].append(r.image_id)
                try:
                    px = decode_image(bytes(r.bytes)).astype(np.int64)
                    if px.shape[0] < 3 or px.shape[1] < 3:
                        raise ValueError("too small for a 3x3 stencil")
                except Exception:
                    out["lap_var_q"].append(None)
                    out["sharp"].append(None)
                    out["keep"].append(False)
                    continue
                luma = _luma_q(px)
                core = luma[1:-1, 1:-1]
                lap = (luma[:-2, 1:-1] + luma[2:, 1:-1] + luma[1:-1, :-2]
                       + luma[1:-1, 2:] - 4 * core)
                n = int(lap.size)
                s = int(lap.sum())
                ss = int((lap * lap).sum())
                var_q = (n * ss - s * s) // (n * n)
                sharp = var_q >= MIN_LAP_VAR
                out["lap_var_q"].append(var_q)
                out["sharp"].append(sharp)
                out["keep"].append(bool(sharp))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(
        run, schema=BLUR_GATE_DDL
    )


QUALITY_GATES_DDL = (
    "image_id string, dyn_range int, entropy_q double, flat boolean, "
    "lap_var_q bigint, sharp boolean, phash bigint, keep boolean"
)


def image_quality_gates(
    images: DataFrame, keep_cols: tuple = ()
) -> DataFrame:
    """FUSED image-quality pass: channel/entropy stats, blur gate, and the
    perceptual hash in ONE decode per payload — the operator the curation
    pipeline actually wants at 100 TB, where decoding is the dominant cost
    and running :func:`channel_stats`, :func:`blur_gate`, and a phash stage
    separately would decode every image three times.

    Same exactness contracts as the single-purpose operators (integer
    sums, fixed-point luma, integer-quantized Laplacian variance,
    fixed-point DCT phash); undecodable/sub-stencil payloads surface as
    NULL-stats keep=false rows. ``mapInPandas`` over Arrow batches,
    ZERO shuffles — composes map-side with the landing stage.

    ``keep_cols`` names input columns to pass through unchanged (schema
    taken from the input) — the no-join alternative to re-attaching
    metadata afterwards, which would make Spark recompute the whole
    upstream (fetch included) for the second join arm.
    """
    extra = [images.schema[c] for c in keep_cols]
    out_schema = QUALITY_GATES_DDL + "".join(
        f", {f.name} {f.dataType.simpleString()}" for f in extra
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "dyn_range", "entropy_q", "flat",
                "lap_var_q", "sharp", "phash", "keep",
                *(f.name for f in extra))}
            for r in pdf.itertuples(index=False):
                out["image_id"].append(r.image_id)
                for f in extra:
                    out[f.name].append(getattr(r, f.name))
                try:
                    px = decode_image(bytes(r.bytes)).astype(np.int64)
                    if px.shape[0] < 3 or px.shape[1] < 3:
                        raise ValueError("too small for a 3x3 stencil")
                except Exception:
                    for k in ("dyn_range", "entropy_q", "flat",
                              "lap_var_q", "sharp", "phash"):
                        out[k].append(None)
                    out["keep"].append(False)
                    continue
                n = px.shape[0] * px.shape[1]
                dyn = int(px.max() - px.min())
                luma = _luma_q(px)
                bins = np.bincount((luma >> 5).ravel(), minlength=8)[:8]
                p = bins[bins > 0] / n
                ent = float(-(p * np.log2(p)).sum())
                flat = dyn < FLAT_DYN_RANGE
                core = luma[1:-1, 1:-1]
                lap = (luma[:-2, 1:-1] + luma[2:, 1:-1] + luma[1:-1, :-2]
                       + luma[1:-1, 2:] - 4 * core)
                ln = int(lap.size)
                s = int(lap.sum())
                ss = int((lap * lap).sum())
                var_q = (ln * ss - s * s) // (ln * ln)
                sharp = var_q >= MIN_LAP_VAR
                # phash64 packs signed-int64 already (Spark LongType)
                ph_signed = phash64(px.astype(np.uint8))
                out["dyn_range"].append(dyn)
                out["entropy_q"].append(round(ent, 6))
                out["flat"].append(flat)
                out["lap_var_q"].append(var_q)
                out["sharp"].append(sharp)
                out["phash"].append(ph_signed)
                out["keep"].append(bool(
                    not flat and ent >= MIN_ENTROPY_BITS and sharp))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", *keep_cols).mapInPandas(
        run, schema=out_schema
    )


WATERMARK_GATE_DDL = (
    "image_id string, band_energy_q bigint, body_energy_q bigint, "
    "watermarked boolean, keep boolean"
)

#: band-vs-body high-frequency energy ratio (x1000) above which the bottom
#: strip is flagged as an overlay/watermark band
WATERMARK_RATIO_MILLI = 3000


def watermark_band_gate(images: DataFrame) -> DataFrame:
    """Overlay/watermark-band detector over DECODED pixels.

    Stock-photo watermarks and broadcaster tickers concentrate sharp
    synthetic edges in a horizontal band (almost always the bottom ~20%);
    training-set curation (LAION-5B's watermark score, DataComp's filters)
    drops or down-weights such images. Without a CNN available in this
    container, the deterministic proxy is the classic energy heuristic:
    mean absolute horizontal-gradient energy in the bottom-quintile band
    vs the rest of the image — a clean photo is roughly isotropic
    (ratio ≈ 1), an overlay band concentrates edges (ratio >> 1). The
    decision threshold is ``band > WATERMARK_RATIO_MILLI/1000 × body``.

    Exactness: ITU-R 601 fixed-point luma (integer //1000), integer
    absolute gradients, per-region integer mean ×1000 (floor) — the same
    bit-identical-under-repartitioning contract as blur_gate, so the gate
    is safe under AQE retries. Undecodable or sub-5-row payloads surface
    as NULL-stats keep=false rows (P10 error-to-null), never exceptions.

    Scale shape: mapInPandas over Arrow batches, ZERO shuffles; in the
    landing pipeline it fuses with the other decode gates via
    image_quality_gates' pattern (one decode per payload).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "image_id",
                    "band_energy_q",
                    "body_energy_q",
                    "watermarked",
                    "keep",
                )
            }
            for r in pdf.itertuples(index=False):
                out["image_id"].append(r.image_id)
                try:
                    px = decode_image(bytes(r.bytes)).astype(np.int64)
                    if px.shape[0] < 5 or px.shape[1] < 2:
                        raise ValueError("too small for a band split")
                except Exception:
                    out["band_energy_q"].append(None)
                    out["body_energy_q"].append(None)
                    out["watermarked"].append(None)
                    out["keep"].append(False)
                    continue
                luma = _luma_q(px)
                grad = np.abs(luma[:, 1:] - luma[:, :-1])
                h = grad.shape[0]
                split = h - max(h // 5, 1)  # bottom quintile, >= 1 row
                body, band = grad[:split], grad[split:]
                band_q = int(1000 * int(band.sum()) // int(band.size))
                body_q = int(1000 * int(body.sum()) // int(body.size))
                marked = band_q * 1000 > body_q * WATERMARK_RATIO_MILLI
                out["band_energy_q"].append(band_q)
                out["body_energy_q"].append(body_q)
                out["watermarked"].append(bool(marked))
                out["keep"].append(not marked)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(
        run, schema=WATERMARK_GATE_DDL
    )
