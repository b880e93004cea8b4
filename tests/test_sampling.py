"""Deterministic stratified sampling + top-k tokens (analytics/sampling.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.sampling import (
    rate_threshold_hex,
    stratified_sample,
    top_tokens,
)


def _keep(key: str, rate: float) -> bool:
    return hashlib.md5(key.encode()).hexdigest()[:4] < rate_threshold_hex(rate)


def test_stratified_matches_row_rule_and_partitioning(spark):
    rows = [(str(i), "a" if i % 3 == 0 else ("b" if i % 3 == 1 else "c")) for i in range(3000)]
    df = spark.createDataFrame(rows, "k string, s string")
    rates = {"a": 0.1, "b": 0.5}
    want = {k for k, s in rows if _keep(k, rates.get(s, 0.9))}
    got = {
        r["k"]
        for r in stratified_sample(df, "k", "s", rates, default_rate=0.9).collect()
    }
    assert got == want
    # selection is a pure row function: any repartitioning gives the SAME set
    got2 = {
        r["k"]
        for r in stratified_sample(
            df.repartition(17, "s"), "k", "s", rates, default_rate=0.9
        ).collect()
    }
    assert got2 == want
    # and rates land within quantization+sampling tolerance
    n_a = sum(1 for k in want if int(k) % 3 == 0)
    assert 0.05 < n_a / 1000 < 0.16


def test_top_tokens_counts_and_ties(spark):
    df = spark.createDataFrame(
        [
            ("en", "the cat  The DOG the"),
            ("en", "dog and cat"),
            ("de", "der der die das"),
        ],
        "lang string, text string",
    )
    got = {
        (r["lang"], r["rk"]): (r["token"], r["n"])
        for r in top_tokens(df, k=2, group_col="lang").collect()
    }
    # normalization lowercases and collapses whitespace before splitting
    assert got[("en", 1)] == ("the", 3)
    assert got[("en", 2)] == ("cat", 2)  # cat==dog==2 -> token asc
    assert got[("de", 1)] == ("der", 2)
    assert got[("de", 2)] == ("das", 1)  # das==die==1 -> token asc


def test_top_tokens_plan_group_limit(spark):
    """The literal rank bound must plant a map-side partial WindowGroupLimit."""
    df = spark.createDataFrame([("en", "a b c")], "lang string, text string")
    plan = top_tokens(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_source_mix_sample_partition_invariant(spark):
    """md5 hash-rank selection must not depend on input partitioning."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()["source_mix_sample"]
    base = sorted(
        (r["doc_id"], r["source"], r["quota"])
        for r in q(spark, "/root/testdata/sf0.001").collect()
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        again = sorted(
            (r["doc_id"], r["source"], r["quota"])
            for r in q(spark, "/root/testdata/sf0.001").collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again and len(base) > 0
