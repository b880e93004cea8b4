"""Image+caption pair gates — each reject branch and the keep path."""

from etherscan_contract_crawler_spark.analytics.multimodal import pair_gates


def test_pair_gates_branches(spark):
    rows = [
        # image_id, w, h, fmt, caption
        (1, 32, 500, "png", "a fine caption here"),         # too_small
        (2, 900, 200, "png", "a fine caption here"),        # bad_aspect (w>3h)
        (3, 200, 900, "png", "a fine caption here"),        # bad_aspect (h>3w)
        (4, 500, 500, "tiff", "a fine caption here"),       # bad_fmt
        (5, 500, 500, "jpeg", "two words"),                 # short_caption
        (6, 500, 500, "jpeg", " ".join(["w"] * 80)),        # long_caption
        (7, 500, 500, "webp", "a fine caption here"),       # keep
        (8, 64, 192, "png", "exactly on the boundary ok"),  # keep (edges)
    ]
    df = spark.createDataFrame(rows, ["image_id", "w", "h", "fmt", "caption"])
    out = {r["image_id"]: r for r in pair_gates(df).collect()}
    expect = {
        1: "too_small", 2: "bad_aspect", 3: "bad_aspect", 4: "bad_fmt",
        5: "short_caption", 6: "long_caption", 7: None, 8: None,
    }
    for k, v in expect.items():
        assert out[k]["reject_reason"] == v, (k, out[k])
        assert out[k]["keep"] is (v is None)
    assert out[6]["n_cap_tokens"] == 80


def test_pair_gates_first_reason_wins(spark):
    # too_small AND bad_fmt AND short caption -> too_small (CASE order)
    df = spark.createDataFrame(
        [(1, 10, 10, "bmp", "x")], ["image_id", "w", "h", "fmt", "caption"]
    )
    assert pair_gates(df).collect()[0]["reject_reason"] == "too_small"
