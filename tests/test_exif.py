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
