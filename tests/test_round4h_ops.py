"""Round-4 batch 5: BPE merge mining + outlink spam ratio — dictionary
weighting and flag-boundary semantics the oracles can't pin alone."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.graph import outlink_spam_ratio
from etherscan_contract_crawler_spark.analytics.text import bpe_merge_mine


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], ["text"])


def test_bpe_merge_mine_counts_by_word_frequency(spark):
    # "ab" appears 3 times as a word -> pair "ab" counted 3x even though
    # the dictionary holds it once (the dictionary-weighting contract)
    out = {r["pair"]: r["n"] for r in bpe_merge_mine(_docs(spark, ["ab ab ab cd"]), 10).collect()}
    assert out["ab"] == 3 and out["cd"] == 1


def test_bpe_merge_mine_pairs_within_words_only(spark):
    # no cross-word pair: "b c" never yields "bc"
    out = {r["pair"]: r["n"] for r in bpe_merge_mine(_docs(spark, ["ab cd"]), 10).collect()}
    assert "bc" not in out
    assert set(out) == {"ab", "cd"}


def test_bpe_merge_mine_overlapping_pairs_and_tiebreak(spark):
    # "aaa" has pairs aa, aa -> n=2; single-char words contribute nothing
    rows = bpe_merge_mine(_docs(spark, ["aaa a b"]), 10).collect()
    assert [(r["pair"], r["n"]) for r in rows] == [("aa", 2)]
    assert (rows[0]["left"], rows[0]["right"]) == ("a", "a")


def test_outlink_spam_ratio_flag_boundary(spark):
    edges = spark.createDataFrame(
        [("a", "s1"), ("a", "ok1"),          # a: 1/2 -> suspect (>= half)
         ("b", "s1"), ("b", "ok1"), ("b", "ok2")],  # b: 1/3 -> clean
        ["src_host", "dst_host"],
    )
    bl = spark.createDataFrame([("s1",)], ["host"])
    out = {r["src_host"]: r for r in outlink_spam_ratio(edges, bl).collect()}
    assert out["a"]["suspect"] is True and out["b"]["suspect"] is False
    assert out["a"]["n_spam"] == 1 and out["b"]["n_out"] == 3


def test_outlink_spam_ratio_zero_spam(spark):
    edges = spark.createDataFrame([("a", "x"), ("a", "y")], ["src_host", "dst_host"])
    bl = spark.createDataFrame([("s1",)], ["host"])
    out = outlink_spam_ratio(edges, bl).collect()[0]
    assert out["n_spam"] == 0 and out["spam_ratio"] == 0.0 and out["suspect"] is False
