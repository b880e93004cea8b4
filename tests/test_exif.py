"""TIFF/EXIF walker (functions/exif.py): encode→parse round-trip on both
byte orders, JPEG APP1 embedding, malformed-blob tolerance (never raises),
and the Spark extraction operator."""

from hypothesis import given, settings
from hypothesis import strategies as st

from etherscan_contract_crawler_spark.functions.exif import (
    encode_tiff_exif,
    exif_extract,
    parse_tiff_exif,
)

FIELDS = {
    "make": "SynthCam",
    "model": "SC-1000 Mark II",
    "orientation": 6,
    "datetime": "2026:08:19 12:00:00",
    "width": 4032,
    "height": 3024,
    "iso": 200,
}


def jpeg_wrap(tiff: bytes) -> bytes:
    seg = b"Exif\0\0" + tiff
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + (4).to_bytes(2, "big") + b"\0\0"  # unrelated APP0
        + b"\xff\xe1" + (2 + len(seg)).to_bytes(2, "big") + seg
        + b"\xff\xda" + b"\0" * 4
    )


def test_roundtrip_both_endians():
    for be in (False, True):
        blob = encode_tiff_exif(FIELDS, big_endian=be)
        assert parse_tiff_exif(blob) == FIELDS, ("big_endian", be)


def test_subset_and_jpeg_app1():
    sub = {"orientation": 1, "width": 640, "height": 480}
    assert parse_tiff_exif(encode_tiff_exif(sub)) == sub
    assert parse_tiff_exif(jpeg_wrap(encode_tiff_exif(FIELDS))) == FIELDS
    # JPEG with no APP1 -> {}
    assert parse_tiff_exif(b"\xff\xd8\xff\xda\0\0") == {}


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_parser_never_raises(blob):
    out = parse_tiff_exif(blob)
    assert isinstance(out, dict)


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=64), st.integers(min_value=0, max_value=199))
def test_truncated_valid_blob_never_raises(noise, cut):
    blob = encode_tiff_exif(FIELDS)
    assert isinstance(parse_tiff_exif(blob[:cut] + noise), dict)


def test_exif_extract_operator(spark):
    rows = [
        ("i1", bytearray(encode_tiff_exif(FIELDS))),
        ("i2", bytearray(encode_tiff_exif({"orientation": 3}, big_endian=True))),
        ("i3", bytearray(b"not an image")),
        ("i4", None),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in exif_extract(df).collect()}
    assert got["i1"]["make"] == "SynthCam" and got["i1"]["orientation"] == 6
    assert got["i1"]["width"] == 4032 and got["i1"]["iso"] == 200
    assert got["i2"]["orientation"] == 3 and got["i2"]["make"] is None
    # garbage and NULL cost one empty row each, never a task failure
    assert got["i3"]["orientation"] is None
    assert got["i4"]["orientation"] is None


def test_normalize_orientation_properties():
    import numpy as np

    from etherscan_contract_crawler_spark.functions.images import (
        normalize_orientation,
        phash64,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)

    # each stored form, normalized, must reproduce the upright pixels —
    # i.e. normalize inverts the transform a camera applied when STORING
    stored = {
        1: img,
        2: img[:, ::-1],
        3: img[::-1, ::-1],
        4: img[::-1, :],
        5: np.swapaxes(img, 0, 1),
        6: np.rot90(img, 1),       # stored = upright rotated 90 CCW -> tag 6
        7: np.swapaxes(img, 0, 1)[::-1, ::-1],  # transverse: self-inverse
        8: np.rot90(img, 3),
    }
    up_hash = phash64(img)
    for o, s in stored.items():
        got = normalize_orientation(np.ascontiguousarray(s), o)
        assert got.shape == img.shape, o
        assert (got == img).all(), f"orientation {o} not inverted"
        assert phash64(got) == up_hash, o

    # garbage orientation values: identity, never raise
    for bad in (None, 0, 9, -1, 255):
        assert (normalize_orientation(img, bad) == img).all()


# ------------------------------------------------------------- GPS PII leg
def test_gps_roundtrip_both_endians():
    from etherscan_contract_crawler_spark.functions.exif import (
        attach_gps, encode_tiff_exif, parse_gps, parse_tiff_exif,
    )

    for be in (False, True):
        t = encode_tiff_exif({"make": "CamX", "orientation": 3, "width": 640},
                             big_endian=be)
        g = attach_gps(t, -59.5, 149.25)
        assert parse_gps(g) == (-59.5, 149.25)
        # attaching GPS must not disturb the existing IFD0/Exif fields
        # (attach_gps rewrites the IFD0 entry table and shifts offsets)
        assert parse_tiff_exif(g) == {"make": "CamX", "orientation": 3, "width": 640}


def test_gps_strip_is_size_preserving_and_unrecoverable():
    from etherscan_contract_crawler_spark.functions.exif import (
        attach_gps, encode_tiff_exif, parse_gps, parse_tiff_exif, strip_gps,
    )

    t = attach_gps(encode_tiff_exif({"iso": 400, "model": "M-1"}), 12.5, -3.25)
    s = strip_gps(t)
    assert len(s) == len(t)  # in-place zeroing, no re-encode
    assert parse_gps(s) is None
    assert parse_tiff_exif(s) == {"iso": 400, "model": "M-1"}  # non-GPS intact
    # the raw coordinate rationals must be GONE from the bytes, not merely
    # unreferenced: every GPS value region is zeroed (12°30'0" starts with
    # the rational 12/1)
    import struct
    rational_12_deg = struct.pack("<II", 12, 1)
    assert rational_12_deg in t
    assert rational_12_deg not in s
    # quadrant refs: all four sign combinations decode correctly pre-strip
    for lat, lon in ((1.5, 2.25), (-1.5, 2.25), (1.5, -2.25), (-1.5, -2.25)):
        assert parse_gps(attach_gps(encode_tiff_exif({"iso": 100}), lat, lon)) == (lat, lon)


def test_gps_malformed_inputs_never_raise():
    from etherscan_contract_crawler_spark.functions.exif import parse_gps, strip_gps

    for blob in (None, b"", b"xx", b"II*\x00", b"not an image at all",
                 b"II" + b"\x2a\x00" + b"\xff\xff\xff\xff"):
        assert parse_gps(blob) is None
        assert strip_gps(blob) == blob
