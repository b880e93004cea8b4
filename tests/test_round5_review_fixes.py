"""Regression pins for the round-4 ADVICE findings fixed in round 5:
attribute extraction scoped to the <a> opening tag, warc_pack's
deterministic within-shard order under duplicate keys, and
outlink_spam_ratio's edge dedupe (the rate_compliance oracle change is
SQL-side only and is pinned by the driver row itself)."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.graph import outlink_spam_ratio
from etherscan_contract_crawler_spark.analytics.packing import warc_pack
from etherscan_contract_crawler_spark.functions.html import a_candidates


def test_a_candidates_text_decoy_does_not_override_attrs(spark):
    # anchor TEXT containing href="..."/rel="..." lookalikes: the real
    # single-quoted attributes in the opening tag must win over the
    # double-quoted decoys in the text (pre-fix, the dq-over-sq preference
    # let the decoy through).
    body = (
        "<a href='https://real.com/r' rel='me'>"
        'see href="https://decoy.com/d" rel="nofollow" here</a>'
    )
    df = spark.createDataFrame([(body,)], ["body"])
    rows = df.select(F.explode(a_candidates("body")).alias("c")).collect()
    assert len(rows) == 1
    c = rows[0]["c"]
    assert c["href"] == "https://real.com/r"
    assert c["nofollow"] is False
    assert c["text"] == 'see href="https://decoy.com/d" rel="nofollow" here'


def test_a_candidates_real_attrs_still_extracted(spark):
    body = '<a href="https://x.com/1" rel="me,nofollow">one</a>'
    df = spark.createDataFrame([(body,)], ["body"])
    c = df.select(F.explode(a_candidates("body")).alias("c")).collect()[0]["c"]
    assert c["href"] == "https://x.com/1"
    assert c["nofollow"] is True


def test_warc_pack_duplicate_keys_deterministic(spark):
    # duplicate (shard, url_key) rows: the sort key includes every column
    # feeding the running sums, so the output multiset must be identical
    # across different input partitionings.
    rows = [("k1", 0, 60), ("k1", 0, 60), ("k1", 0, 40), ("k2", 0, 60)]
    cols = ["url_key", "shard", "n_bytes"]

    def run(n_parts):
        df = spark.createDataFrame(rows, cols).repartition(n_parts)
        return sorted(
            (r["url_key"], r["shard"], r["n_bytes"], r["seg_idx"], r["seg_offset"])
            for r in warc_pack(df, segment_bytes=100).collect()
        )

    a, b = run(1), run(7)
    assert a == b
    # greedy rule with order (k1,40),(k1,60),(k1,60),(k2,60):
    # cum_before = 0,40,100,160 -> seg 0,0,1,1 ; offsets 0,40,0,60
    assert a == sorted(
        [("k1", 0, 40, 0, 0), ("k1", 0, 60, 0, 40), ("k1", 0, 60, 1, 0),
         ("k2", 0, 60, 1, 60)]
    )


def test_outlink_spam_ratio_dedupes_repeated_links(spark):
    # a nav-bar link repeated on every page: multiplicity must not inflate
    # n_out/n_spam or flip the suspect flag (consistent with trustrank /
    # seed_hop_distance, which dedupe edges).
    edges = spark.createDataFrame(
        [("a", "s1")] * 5 + [("a", "ok1"), ("a", "ok2")],
        ["src_host", "dst_host"],
    )
    bl = spark.createDataFrame([("s1",)], ["host"])
    out = outlink_spam_ratio(edges, bl).collect()[0]
    assert out["n_out"] == 3 and out["n_spam"] == 1
    assert out["suspect"] is False  # 2*1 < 3
