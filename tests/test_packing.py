"""Sequence packing: placement arithmetic and bucket independence."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.packing import sequence_pack


def test_placement_arithmetic(spark):
    # one bucket (n_buckets=1): order is by md5(doc_id) — recompute it here
    rows = [(i, 1000) for i in range(5)]  # 1000 tokens each, seq_len 2048
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = sequence_pack(df, seq_len=2048, n_buckets=1).collect()
    import hashlib

    order = sorted(range(5), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    placed = {r["doc_id"]: r for r in out}
    cum = 0
    for doc in order:
        r = placed[doc]
        assert r["seq_idx"] == cum // 2048 and r["offset"] == cum % 2048, r
        cum += 1000
    # 5000 tokens over 2048-windows: last doc starts inside window 1 or 2
    assert max(r["seq_idx"] for r in out) == (4 * 1000) // 2048


def test_buckets_pack_independently(spark):
    rows = [(i, 100) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = sequence_pack(df, seq_len=512, n_buckets=4).collect()
    # each bucket holds doc_ids with the same id%4 and its own prefix sums
    by_bucket = {}
    for r in out:
        assert r["bucket"] == r["doc_id"] % 4
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rs in by_bucket.values():
        starts = sorted(r["seq_idx"] * 512 + r["offset"] for r in rs)
        assert starts == [100 * i for i in range(len(rs))]
