"""EXIF metadata — a REAL TIFF 6.0 IFD walker written against the public
spec (like the PNG codec in images.py), plus the Spark extraction operator.

Why a crawler needs it: image curation gates on capture metadata —
orientation (rotate-before-phash, or the same photo mirrored dodges
near-dup), capture time (dedup bursts), camera make/model (device mix),
and the Exif pixel dimensions (detect downscaled re-posts of the same
shot). The reference never touches binary metadata (its payloads are
source text); the input_hint's image corpus makes this a first-class
column.

Format notes (TIFF 6.0 §2, EXIF 2.3 §4.6): header = byte order
(``II``/``MM``) + magic 42 + IFD0 offset; an IFD = u16 entry count, then
12-byte entries (tag u16, type u16, count u32, value-or-offset u32), then
the next-IFD offset. Values wider than 4 bytes live at the offset. EXIF
proper hangs off IFD0 tag 0x8769 as a sub-IFD. Inside a JPEG the whole
TIFF structure rides an APP1 segment tagged ``Exif\\0\\0``.

Parsing is defensive by construction: every offset/length is bounds-checked
and a malformed blob yields an EMPTY dict, never an exception — one corrupt
image on the web must cost one empty row, not a task.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
    0xA002: "width",
    0xA003: "height",
    0x8827: "iso",
}
_EXIF_IFD_TAG = 0x8769
#: type -> (struct code, byte size); subset the tags above use
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 2: (None, 1)}  # 2 = ASCII

EXIF_DDL = (
    "orientation int, make string, model string, datetime string, "
    "width int, height int, iso int"
)
_FIELDS = ("orientation", "make", "model", "datetime", "width", "height", "iso")


def encode_tiff_exif(fields: dict, big_endian: bool = False) -> bytes:
    """Build a spec-compliant TIFF-EXIF blob carrying ``fields`` (any subset
    of make/model/orientation/datetime/width/height/iso). IFD0 carries the
    camera/orientation tags plus the 0x8769 pointer; width/height/iso live
    in the Exif sub-IFD, exactly where real cameras put them."""
    bo = ">" if big_endian else "<"

    def entries_for(names):
        out = []
        for tag, name in sorted(TAGS.items()):
            if name not in names or name not in fields:
                continue
            v = fields[name]
            if isinstance(v, str):
                out.append((tag, 2, v.encode() + b"\0"))
            else:
                out.append((tag, 3, int(v)))
        return out

    ifd0 = entries_for({"make", "model", "orientation", "datetime"})
    exif = entries_for({"width", "height", "iso"})

    def build_ifd(entries, base_off, pointer_to=None):
        """Serialize one IFD starting at ``base_off``; ``pointer_to`` adds
        the 0x8769 sub-IFD pointer entry (value filled by the caller via a
        second pass — the offset only depends on THIS ifd's size)."""
        n = len(entries) + (1 if pointer_to is not None else 0)
        tail_off = base_off + 2 + 12 * n + 4
        body, tail = b"", b""
        for tag, typ, val in entries:
            if typ == 2:
                if len(val) <= 4:
                    vo = val.ljust(4, b"\0")
                else:
                    vo = struct.pack(bo + "I", tail_off + len(tail))
                    tail += val
                body += struct.pack(bo + "HHI", tag, 2, len(val)) + vo
            else:
                body += struct.pack(bo + "HHI", tag, 3, 1)
                body += struct.pack(bo + "H", val) + b"\0\0"
        if pointer_to is not None:
            body += struct.pack(bo + "HHI", _EXIF_IFD_TAG, 4, 1)
            body += struct.pack(bo + "I", pointer_to)
        return (
            struct.pack(bo + "H", n) + body + struct.pack(bo + "I", 0) + tail
        )

    # pass 1 sizes IFD0 (the sub-IFD offset depends only on IFD0's length),
    # pass 2 writes the real pointer
    exif_off = 8 + len(build_ifd(ifd0, 8, pointer_to=0))
    ifd0_bytes = build_ifd(ifd0, 8, pointer_to=exif_off)
    header = (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, 8)
    return header + ifd0_bytes + build_ifd(exif, exif_off)


def _read_ifd(data: bytes, bo: str, off: int, out: dict) -> int | None:
    """Parse one IFD at ``off`` into ``out``; returns the Exif sub-IFD
    offset if its pointer tag is present."""
    if off + 2 > len(data):
        return None
    (n,) = struct.unpack_from(bo + "H", data, off)
    sub = None
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            return sub
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        if tag == _EXIF_IFD_TAG:
            (sub,) = struct.unpack_from(bo + "I", data, e + 8)
            continue
        name = TAGS.get(tag)
        if name is None or typ not in _TYPES:
            continue
        code, size = _TYPES[typ]
        total = size * cnt
        voff = e + 8 if total <= 4 else struct.unpack_from(bo + "I", data, e + 8)[0]
        if voff + total > len(data):
            continue
        if typ == 2:  # ASCII, NUL-terminated
            out[name] = data[voff : voff + cnt].split(b"\0", 1)[0].decode(
                "ascii", "replace"
            )
        else:
            out[name] = int(struct.unpack_from(bo + code, data, voff)[0])
    return sub


def parse_tiff_exif(data: bytes | None) -> dict:
    """Parse a TIFF-EXIF blob (or a JPEG carrying one in APP1) into a dict
    of the supported tags. Malformed/absent metadata -> {} (never raises)."""
    if not data:
        return {}
    if data[:2] == b"\xff\xd8":  # JPEG: find the Exif APP1 segment
        i = 2
        while i + 4 <= len(data) and data[i] == 0xFF:
            marker, seglen = data[i + 1], int.from_bytes(data[i + 2 : i + 4], "big")
            if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\0\0":
                data = data[i + 10 : i + 2 + seglen]
                break
            if marker in (0xDA, 0xD9):  # image data starts: no EXIF
                return {}
            i += 2 + seglen
        else:
            return {}
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        return {}
    bo = "<" if data[:2] == b"II" else ">"
    try:
        magic, ifd0 = struct.unpack_from(bo + "HI", data, 2)
    except struct.error:
        return {}
    if magic != 42:
        return {}
    out: dict = {}
    sub = _read_ifd(data, bo, ifd0, out)
    if sub:
        _read_ifd(data, bo, sub, out)
    return out


def exif_extract(images, bytes_col: str = "bytes", keep_cols=("image_id",)):
    """Spark operator: one metadata struct row per image — Arrow-batched
    ``mapInPandas`` (binary parsing is the honest Python path; the per-row
    work is bounded by the EXIF segment, 64 KB max by the APP1 length
    field, so no row can straggle)."""
    import pandas as pd

    keep = list(keep_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: list(pdf[c]) for c in keep}
            for f in _FIELDS:
                rows[f] = []
            for b in pdf[bytes_col]:
                got = parse_tiff_exif(bytes(b) if b is not None else None)
                for f in _FIELDS:
                    rows[f].append(got.get(f))
            yield pd.DataFrame(rows)

    keep_ddl = ", ".join(f"{c} string" for c in keep)
    return images.mapInPandas(run, schema=f"{keep_ddl}, {EXIF_DDL}")
