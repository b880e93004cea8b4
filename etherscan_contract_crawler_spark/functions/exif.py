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


# --------------------------------------------------------------- GPS PII
# EXIF 2.3 §4.6.6: GPS data hangs off IFD0 tag 0x8825 as its own sub-IFD.
# Latitude/longitude are RATIONAL (type 5: u32 numerator / u32 denominator)
# triples (degrees, minutes, seconds) plus one-char N/S/E/W refs. Location
# EXIF is the canonical image-side PII: a web-scale image pipeline must be
# able to (a) detect it, (b) surface coordinates for geo-dedup/filtering,
# and (c) scrub it without re-encoding the payload.
_GPS_IFD_TAG = 0x8825
_GPS_TAGS = {1: "latref", 2: "lat", 3: "lonref", 4: "lon"}
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _dms_rationals(deg: float) -> list[tuple[int, int]]:
    """decimal degrees -> ((d,1),(m,1),(s*10^4,10^4)) — the camera-standard
    DMS triple; seconds carry 4 decimal places."""
    ax = abs(deg)
    d = int(ax)
    mfull = (ax - d) * 60.0
    m = int(mfull)
    s_num = round((mfull - m) * 60.0 * 10_000)
    return [(d, 1), (m, 1), (s_num, 10_000)]


def encode_gps_ifd(lat: float, lon: float, big_endian: bool = False, base_off: int = 0) -> bytes:
    """Serialize a GPS sub-IFD at ``base_off``: 4 entries (latref, lat,
    lonref, lon), rational triples in the tail."""
    bo = ">" if big_endian else "<"
    n = 4
    tail_off = base_off + 2 + 12 * n + 4
    body, tail = b"", b""
    for tag, (ref, val) in (
        (1, ("N" if lat >= 0 else "S", None)),
        (2, (None, _dms_rationals(lat))),
        (3, ("E" if lon >= 0 else "W", None)),
        (4, (None, _dms_rationals(lon))),
    ):
        if ref is not None:
            body += struct.pack(bo + "HHI", tag, 2, 2) + ref.encode() + b"\0\0\0"
        else:
            body += struct.pack(bo + "HHI", tag, 5, 3)
            body += struct.pack(bo + "I", tail_off + len(tail))
            tail += b"".join(struct.pack(bo + "II", num, den) for num, den in val)
    return struct.pack(bo + "H", n) + body + struct.pack(bo + "I", 0) + tail


def attach_gps(tiff: bytes, lat: float, lon: float) -> bytes:
    """Append a GPS sub-IFD to an existing (our-encoder) TIFF blob and add
    the 0x8825 pointer entry to IFD0 — entry-table rewrite, everything else
    byte-preserved (offsets after IFD0 shift by exactly 12, so IFD0's
    value/sub-IFD offsets are patched by the same delta)."""
    if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
        return tiff
    bo = "<" if tiff[:2] == b"II" else ">"
    magic, ifd0 = struct.unpack_from(bo + "HI", tiff, 2)
    if magic != 42:
        return tiff
    (n,) = struct.unpack_from(bo + "H", tiff, ifd0)
    end_entries = ifd0 + 2 + 12 * n
    gps_off = len(tiff) + 12  # after the whole (grown-by-one-entry) blob
    # rebuild IFD0 with one more entry; every absolute offset stored past
    # the insertion point moves by +12
    out = bytearray(tiff[:ifd0])
    out += struct.pack(bo + "H", n + 1)
    for i in range(n):
        e = ifd0 + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, e)
        size = _TYPE_SIZES.get(typ, 1)
        if size * cnt > 4 or tag == _EXIF_IFD_TAG:
            (voff,) = struct.unpack_from(bo + "I", tiff, e + 8)
            out += tiff[e : e + 8] + struct.pack(bo + "I", voff + 12)
        else:
            out += tiff[e : e + 12]
    out += struct.pack(bo + "HHI", _GPS_IFD_TAG, 4, 1)
    out += struct.pack(bo + "I", gps_off)
    out += tiff[end_entries:]  # next-IFD word + tails + Exif sub-IFD
    out += encode_gps_ifd(lat, lon, big_endian=(bo == ">"), base_off=gps_off)
    return bytes(out)


def _read_gps(data: bytes, bo: str, off: int):
    """GPS sub-IFD -> (lat, lon) decimal degrees rounded to 6, or None."""
    if off + 2 > len(data):
        return None
    (n,) = struct.unpack_from(bo + "H", data, off)
    got: dict = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            return None
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        name = _GPS_TAGS.get(tag)
        if name is None:
            continue
        if typ == 2 and cnt <= 4:
            got[name] = data[e + 8 : e + 8 + cnt].split(b"\0", 1)[0].decode("ascii", "replace")
        elif typ == 5 and cnt == 3:
            (voff,) = struct.unpack_from(bo + "I", data, e + 8)
            if voff + 24 > len(data):
                return None
            r = struct.unpack_from(bo + "IIIIII", data, voff)
            if r[1] == 0 or r[3] == 0 or r[5] == 0:
                return None
            got[name] = r[0] / r[1] + r[2] / r[3] / 60.0 + r[4] / r[5] / 3600.0
    if not {"lat", "lon", "latref", "lonref"} <= got.keys():
        return None
    lat = round(got["lat"] * (-1 if got["latref"] == "S" else 1), 6)
    lon = round(got["lon"] * (-1 if got["lonref"] == "W" else 1), 6)
    return lat, lon


def parse_gps(data: bytes | None):
    """(lat, lon) from a TIFF blob's GPS sub-IFD, or None. Same defensive
    contract as parse_tiff_exif: malformed input -> None, never raises."""
    if not data or len(data) < 8 or data[:2] not in (b"II", b"MM"):
        return None
    bo = "<" if data[:2] == b"II" else ">"
    try:
        magic, ifd0 = struct.unpack_from(bo + "HI", data, 2)
    except struct.error:
        return None
    if magic != 42 or ifd0 + 2 > len(data):
        return None
    (n,) = struct.unpack_from(bo + "H", data, ifd0)
    for i in range(n):
        e = ifd0 + 2 + 12 * i
        if e + 12 > len(data):
            return None
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        if tag == _GPS_IFD_TAG:
            (gps_off,) = struct.unpack_from(bo + "I", data, e + 8)
            return _read_gps(data, bo, gps_off)
    return None


def strip_gps(data: bytes | None) -> bytes | None:
    """Scrub location PII IN PLACE (size-preserving): zero the 0x8825
    pointer entry in IFD0 (tag 0 is skipped by every conformant reader),
    the GPS IFD's entry table, and every offset-stored GPS value. No
    re-encode, no offset shifts — all non-GPS bytes are untouched, so the
    scrub can never corrupt fields it does not understand."""
    if not data or len(data) < 8 or data[:2] not in (b"II", b"MM"):
        return data
    bo = "<" if data[:2] == b"II" else ">"
    try:
        magic, ifd0 = struct.unpack_from(bo + "HI", data, 2)
    except struct.error:
        return data
    if magic != 42 or ifd0 + 2 > len(data):
        return data
    buf = bytearray(data)
    (n,) = struct.unpack_from(bo + "H", data, ifd0)
    for i in range(n):
        e = ifd0 + 2 + 12 * i
        if e + 12 > len(data):
            break
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, e)
        if tag != _GPS_IFD_TAG:
            continue
        (gps_off,) = struct.unpack_from(bo + "I", data, e + 8)
        buf[e : e + 12] = b"\0" * 12
        if gps_off + 2 <= len(data):
            (gn,) = struct.unpack_from(bo + "H", data, gps_off)
            for j in range(gn):
                ge = gps_off + 2 + 12 * j
                if ge + 12 > len(data):
                    break
                gtag, gtyp, gcnt = struct.unpack_from(bo + "HHI", data, ge)
                total = _TYPE_SIZES.get(gtyp, 0) * gcnt
                if total > 4:
                    (voff,) = struct.unpack_from(bo + "I", data, ge + 8)
                    if voff + total <= len(data):
                        buf[voff : voff + total] = b"\0" * total
            end = min(gps_off + 2 + 12 * gn + 4, len(data))
            buf[gps_off:end] = b"\0" * (end - gps_off)
    return bytes(buf)


GPS_DDL = (
    "has_gps boolean, lat double, lon double, "
    "scrub_clean boolean, size_unchanged boolean"
)


def gps_scrub(images, bytes_col: str = "bytes", keep_cols=("image_id",)):
    """Spark operator: detect + surface + scrub GPS EXIF in one Arrow-
    batched pass. Emits per image: has_gps, decoded (lat, lon), and two
    self-audit bits computed from the REAL scrubbed bytes — scrub_clean
    (re-parse of the scrubbed blob finds no GPS) and size_unchanged (the
    in-place scrub preserved byte length). Both must be uniformly true;
    the driver oracle pins them."""
    import pandas as pd

    keep = list(keep_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: list(pdf[c]) for c in keep}
            has, lats, lons, clean, same = [], [], [], [], []
            for b in pdf[bytes_col]:
                raw = bytes(b) if b is not None else None
                got = parse_gps(raw)
                scrubbed = strip_gps(raw)
                has.append(got is not None)
                lats.append(got[0] if got else None)
                lons.append(got[1] if got else None)
                clean.append(parse_gps(scrubbed) is None)
                same.append((len(scrubbed) if scrubbed else 0) == (len(raw) if raw else 0))
            rows.update(
                has_gps=has, lat=lats, lon=lons, scrub_clean=clean, size_unchanged=same
            )
            yield pd.DataFrame(rows)

    keep_ddl = ", ".join(f"{c} string" for c in keep)
    return images.mapInPandas(run, schema=f"{keep_ddl}, {GPS_DDL}")
