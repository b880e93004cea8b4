"""Codec + phash unit/property tests (no Spark — pure numpy layer)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etherscan_contract_crawler_spark.functions.images import (
    decode_image,
    decode_png,
    decode_qjpg,
    encode_png,
    encode_qjpg,
    hamming64,
    phash64,
    psnr,
)
from etherscan_contract_crawler_spark.operators.validate import PSNR_GATE_DB


def _img(seed, h=32, w=48):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip_exact():
    a = _img(1)
    assert np.array_equal(decode_png(encode_png(a)), a)


def test_qjpg_lossy_over_gate():
    a = _img(2, 64, 64)
    d = decode_qjpg(encode_qjpg(a))
    assert psnr(a, d) >= PSNR_GATE_DB


def test_decode_dispatch():
    a = _img(3)
    assert np.array_equal(decode_image(encode_png(a)), a)
    assert decode_image(encode_qjpg(a)).shape == a.shape


@given(st.integers(0, 10_000), st.sampled_from([8, 17, 32, 64]), st.sampled_from([8, 31, 64]))
@settings(max_examples=20, deadline=None)
def test_png_roundtrip_property(seed, h, w):
    a = _img(seed, h, w)
    assert np.array_equal(decode_png(encode_png(a)), a)


def test_phash_deterministic_and_robust():
    a = _img(4, 64, 64)
    assert phash64(a) == phash64(a.copy())
    # lossy roundtrip should barely move the hash
    d = decode_qjpg(encode_qjpg(a))
    assert hamming64(phash64(a), phash64(d)) <= 4
    # a different image should be far
    b = _img(5, 64, 64)
    assert hamming64(phash64(a), phash64(b)) > 8


def test_phash_int64_range():
    v = phash64(_img(6))
    assert -(2**63) <= v < 2**63


def test_channel_stats_verdicts(spark):
    import numpy as np

    from etherscan_contract_crawler_spark.functions.images import encode_png
    from etherscan_contract_crawler_spark.operators.validate import channel_stats

    solid = encode_png(np.full((8, 8, 3), 100, dtype=np.uint8))
    grad = np.zeros((8, 8, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    grad[:, :, 1] = 255 - grad[:, :, 0]
    gradient = encode_png(grad)
    df = spark.createDataFrame(
        [("solid", bytearray(solid)), ("grad", bytearray(gradient)),
         ("junk", bytearray(b"\x89PNG not really"))],
        "image_id string, bytes binary",
    )
    out = {r.image_id: r for r in channel_stats(df).collect()}
    s = out["solid"]
    assert (s.mean_r, s.mean_g, s.mean_b) == (100, 100, 100)
    assert s.dyn_range == 0 and s.flat and not s.keep
    g = out["grad"]
    assert g.dyn_range == 255 and not g.flat and g.keep
    assert g.entropy_q > 0.5
    # exact integer means: channel sums are arithmetic series
    assert g.mean_r == sum(i * 4 for i in range(64)) // 64
    j = out["junk"]
    assert j.mean_r is None and j.flat is None and j.keep is False


def test_blur_gate_ordering_and_verdicts(spark):
    import numpy as np

    from etherscan_contract_crawler_spark.functions.images import (
        decode_image,
        encode_png,
    )
    from etherscan_contract_crawler_spark.operators.validate import (
        MIN_LAP_VAR,
        blur_gate,
    )
    from etherscan_contract_crawler_spark.sources.synthetic import (
        payload_for_key,
    )

    import hashlib

    key = hashlib.sha1(b"blurgate-fixture").hexdigest()
    sharp_bytes = payload_for_key(key)["bytes"]
    px = decode_image(sharp_bytes).astype(np.int64)
    acc = np.zeros_like(px[1:-1, 1:-1])
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            acc += px[dy:px.shape[0] - 2 + dy, dx:px.shape[1] - 2 + dx]
    blurred = encode_png((acc // 9).astype(np.uint8))
    ramp = np.linspace(0, 255, 24, dtype=np.uint8)
    gradient = encode_png(
        np.broadcast_to(ramp[None, :, None], (24, 24, 3)).copy())
    df = spark.createDataFrame(
        [("sharp", bytearray(sharp_bytes)), ("blur", bytearray(blurred)),
         ("grad", bytearray(gradient)), ("junk", bytearray(b"nope")),
         ("tiny", bytearray(encode_png(
             np.full((2, 2, 3), 7, dtype=np.uint8))))],
        "image_id string, bytes binary",
    )
    out = {r.image_id: r for r in blur_gate(df).collect()}
    # focus-measure ordering: textured > box-blurred copy > smooth gradient
    assert out["sharp"].lap_var_q > out["blur"].lap_var_q
    assert out["blur"].lap_var_q > out["grad"].lap_var_q
    assert out["sharp"].sharp and out["sharp"].keep
    assert out["sharp"].lap_var_q >= MIN_LAP_VAR
    # a horizontal luma ramp has near-zero Laplacian everywhere
    assert not out["grad"].sharp and not out["grad"].keep
    # error-to-null: undecodable and sub-stencil payloads never raise
    for k in ("junk", "tiny"):
        assert out[k].lap_var_q is None and out[k].keep is False
    # integer-exact: same verdicts regardless of partitioning
    again = {r.image_id: r.lap_var_q
             for r in blur_gate(df.repartition(7)).collect()}
    assert again == {k: v.lap_var_q for k, v in out.items()}


def test_image_quality_gates_fused_consistency(spark):
    """The fused single-decode operator must agree bit-for-bit with the
    single-purpose channel_stats / blur_gate / phash64 it fuses."""
    import hashlib

    import numpy as np

    from etherscan_contract_crawler_spark.functions.images import (
        decode_image,
        encode_png,
        phash64,
    )
    from etherscan_contract_crawler_spark.operators.validate import (
        blur_gate,
        channel_stats,
        image_quality_gates,
    )
    from etherscan_contract_crawler_spark.sources.synthetic import (
        payload_for_key,
    )

    rows = []
    for i in range(6):
        key = hashlib.sha1(f"fused-{i}".encode()).hexdigest()
        rows.append((key, bytearray(payload_for_key(key)["bytes"])))
    rows.append(("solid", bytearray(
        encode_png(np.full((12, 12, 3), 50, dtype=np.uint8)))))
    rows.append(("junk", bytearray(b"broken")))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")

    fused = {r.image_id: r for r in image_quality_gates(df).collect()}
    chan = {r.image_id: r for r in channel_stats(df).collect()}
    blur = {r.image_id: r for r in blur_gate(df).collect()}
    assert set(fused) == set(chan) == set(blur)
    for k, b in rows:
        assert fused[k].dyn_range == chan[k].dyn_range
        assert fused[k].entropy_q == chan[k].entropy_q
        assert fused[k].flat == chan[k].flat
        assert fused[k].lap_var_q == blur[k].lap_var_q
        assert fused[k].sharp == blur[k].sharp
        if fused[k].phash is not None:
            assert fused[k].phash == phash64(decode_image(bytes(b)))
        assert fused[k].keep == bool(
            chan[k].keep and blur[k].keep)
    assert fused["junk"].keep is False and fused["junk"].phash is None
    assert fused["solid"].keep is False          # flat gate fires


def test_image_curation_pipeline(spark):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()["image_curation"]
    out = q(spark, "/root/testdata/sf0.001").collect()
    assert out, "curation produced no kept images"
    # canonical rows: distinct phash groups, each with a stable min id
    phashes = [r.phash for r in out]
    assert len(phashes) == len(set(phashes))
    assert all(r.n_copies >= 1 for r in out)
    # partition invariance: same canonical set regardless of planning run
    again = q(spark, "/root/testdata/sf0.001").collect()
    assert sorted((r.image_id, r.phash, r.n_copies) for r in out) == \
        sorted((r.image_id, r.phash, r.n_copies) for r in again)
