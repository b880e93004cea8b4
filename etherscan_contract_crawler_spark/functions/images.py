"""Image payload codecs + perceptual hashing — pure numpy/zlib, no native libs.

The crawl payload is an image+caption row (BASELINE.json ``input_hint``):
``(image_id, bytes, w, h, fmt, caption, phash)``. These helpers run INSIDE
Arrow-batched pandas UDFs (see operators/validate.py) — the Spark side stays
vectorized; per-image work here is numpy.

Container note: PIL/libjpeg are not installed in this sandbox, so
  * ``png``  — a REAL PNG codec (8-bit RGB, zlib, scanline filters) written
    against the public PNG spec; lossless round-trip, readable by any viewer.
  * ``jpeg`` — a clearly-marked DETERMINISTIC LOSSY STAND-IN ("QJPG"): uniform
    quantization (step q) + zlib. It reproduces the *contract* the pipeline
    needs from a lossy codec — decode(encode(x)) ~= x with PSNR >= 40 dB —
    without libjpeg. When PIL is importable, real JPEG is used instead
    (see ``_HAVE_PIL`` gate below).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # real JPEG if an imaging lib is present (not in this sandbox)
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QJPG_MAGIC = b"QJPG"
#: quantization step for the lossy stand-in; PSNR ~= 20*log10(255/(q/sqrt(12)))
#: q=4 -> ~46.9 dB, comfortably over the 40 dB gate.
QJPG_Q = 4


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a spec-compliant RGB8 PNG."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # filter type 0 (None) per scanline
    raw = np.concatenate([np.zeros((h, 1), np.uint8), arr.reshape(h, w * 3)], axis=1)
    idat = zlib.compress(raw.tobytes(), 1)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit RGB PNG (filters 0-4 supported) to (h, w, 3) uint8."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, 0
    idat = b""
    h = bit_depth = color_type = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if bit_depth != 8 or color_type != 2:
        raise NotImplementedError("codec supports 8-bit RGB PNGs (what the engine writes)")
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    stride = w * 3
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint16)
    for y in range(h):
        ftype, line = raw[y, 0], raw[y, 1:].astype(np.uint16)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + (out[y - 1] if y else 0)) & 0xFF
        else:  # Sub / Average / Paeth need left-neighbor recurrence
            prev = out[y - 1] if y else np.zeros(stride, np.uint16)
            cur = np.zeros(stride, np.uint16)
            for x in range(stride):
                a = int(cur[x - 3]) if x >= 3 else 0
                b = int(prev[x])
                cc = int(prev[x - 3]) if x >= 3 else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                elif ftype == 4:
                    pred = _paeth(a, b, cc)
                else:
                    raise NotImplementedError(f"PNG filter {ftype}")
                cur[x] = (int(line[x]) + pred) & 0xFF
            out[y] = cur
    return out.astype(np.uint8).reshape(h, w, 3)


def encode_qjpg(arr: np.ndarray, q: int = QJPG_Q) -> bytes:
    """Deterministic lossy stand-in for JPEG (see module docstring)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    quant = ((arr.astype(np.uint16) + q // 2) // q).astype(np.uint8)  # values 0..ceil(255/q)
    body = zlib.compress(quant.tobytes(), 1)
    return _QJPG_MAGIC + struct.pack(">HHB", w, h, q) + body


def decode_qjpg(data: bytes) -> np.ndarray:
    assert data[:4] == _QJPG_MAGIC, "not a QJPG payload"
    w, h, q = struct.unpack(">HHB", data[4:9])
    quant = np.frombuffer(zlib.decompress(data[9:]), np.uint8).reshape(h, w, 3)
    return np.minimum(quant.astype(np.uint16) * q, 255).astype(np.uint8)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Dispatch: 'png' -> real PNG; 'jpeg' -> PIL JPEG if available else QJPG."""
    if fmt == "png":
        return encode_png(arr)
    if fmt == "jpeg":
        if _HAVE_PIL:  # pragma: no cover - not in sandbox
            import io

            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            return buf.getvalue()
        return encode_qjpg(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Sniff-and-decode any payload this engine writes."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:4] == _QJPG_MAGIC:
        return decode_qjpg(data)
    if _HAVE_PIL:  # pragma: no cover
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError("unrecognized image container (PIL not installed)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def _dct_matrix_fixed(n: int, scale_bits: int = 12) -> np.ndarray:
    """DCT-II basis in fixed point (int64). Integer matmuls bypass BLAS, so
    the hash is bit-identical on every worker — float DCT is NOT (BLAS
    reduction order varies by thread count/SIMD path and flips borderline
    bits, which broke cross-process phash equality)."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2.0 * n))
    m[0] /= np.sqrt(2.0)
    return np.round(m * (1 << scale_bits)).astype(np.int64)


_DCT32_FIXED = _dct_matrix_fixed(32)


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: integer grayscale -> 32x32 -> fixed-point 2D
    DCT-II -> top-left 8x8 coefficients -> bit i = coef_i > median(coefs
    excluding DC). Exact integer arithmetic end-to-end (deterministic across
    processes/machines); signed-int64 packed (Spark LongType)."""
    h, w = arr.shape[:2]
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    # downsample BEFORE the grayscale weighting — per-pixel ops commute with
    # row/col sampling, so this is bit-identical to weighting the full image
    # while touching 16x less memory for 128px inputs
    a = arr[np.ix_(yi, xi)].astype(np.int64)
    small = 299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]  # x1000, <= 2^18
    # |basis| <= 2^12; products bounded by 2^12*2^18*32 * 2^12*32 ~ 2^52 < 2^63
    d = _DCT32_FIXED @ small @ _DCT32_FIXED.T
    block = d[:8, :8].flatten()
    med = int(np.median(block[1:]))  # median of 63 ints = an int (middle element)
    bits = np.uint64(0)
    for i, v in enumerate(block):
        if v > med:
            bits |= np.uint64(1) << np.uint64(i)
    return int(bits.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))


#: EXIF orientation (tag 0x0112) -> the transform that renders the stored
#: pixels upright. Values per the EXIF 2.3 / TIFF spec:
#:   1 = as stored            5 = transpose (flip across main diagonal)
#:   2 = mirror horizontal    6 = rotate 90 CW
#:   3 = rotate 180           7 = transverse (flip across anti-diagonal)
#:   4 = mirror vertical      8 = rotate 90 CCW
def normalize_orientation(arr: np.ndarray, orientation: int | None) -> np.ndarray:
    """Render an (h, w, c) array upright per its EXIF orientation.

    Run BEFORE :func:`phash64`: the DCT hash is not invariant under
    rotation/mirror, so the same photo stored sideways (every phone camera)
    or mirrored would dodge near-dup banding entirely. Unknown/invalid
    orientation values are treated as 1 (as stored) — garbage metadata must
    not crash or flip an image.

    Pure numpy views (rot90/flip return views; one ascontiguousarray at the
    end) — no copy chain, no Python-loop pixels.
    """
    o = orientation if orientation in range(1, 9) else 1
    if o == 2:
        out = arr[:, ::-1]
    elif o == 3:
        out = arr[::-1, ::-1]
    elif o == 4:
        out = arr[::-1, :]
    elif o == 5:
        out = np.swapaxes(arr, 0, 1)
    elif o == 6:
        out = np.rot90(arr, 3)
    elif o == 7:  # transverse is its own inverse: anti-diagonal flip
        out = np.swapaxes(arr, 0, 1)[::-1, ::-1]
    elif o == 8:
        out = np.rot90(arr, 1)
    else:
        out = arr
    return np.ascontiguousarray(out)
