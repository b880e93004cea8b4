"""Round-4 batch 6: shard balance audit + adaptive politeness — the
integer-boundary and feedback-direction semantics."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.packing import shard_skew_report
from etherscan_contract_crawler_spark.operators.politeness import (
    adaptive_politeness,
)


def test_shard_skew_flags_the_fat_shard(spark):
    # shards 0/1 hold 100 tokens, shard 2 holds 130 (mean 110): devs are
    # floor-division permille; only shard 2 breaks the ±10% gate
    rows = [(0, 100), (1, 100), (2, 130)]
    df = spark.createDataFrame(rows, ["shard", "n_tokens"])
    out = {r["shard"]: r for r in shard_skew_report(df).collect()}
    assert out[2]["ok"] is False and out[0]["ok"] is True
    # dev_milli: (1000*130*3 - 1000*330) DIV 330 = 60000 DIV 330 = 181
    assert out[2]["dev_milli"] == 181
    assert out[0]["dev_milli"] < 0  # below mean


def test_shard_skew_balanced_is_all_ok(spark):
    df = spark.createDataFrame([(i, 50) for i in range(4)], ["shard", "n_tokens"])
    out = shard_skew_report(df).collect()
    assert all(r["ok"] for r in out)
    assert all(r["dev_milli"] == 0 for r in out)


def _stats(spark, rows):
    return spark.createDataFrame(rows, ["domain", "n_ok", "n_total"])


def test_adaptive_politeness_scales_with_success_rate(spark):
    rows = [("clean", 10, 10), ("half", 5, 10), ("dead", 0, 10)]
    out = {
        r["domain"]: r["budget"]
        for r in adaptive_politeness(_stats(spark, rows), base_budget=8).collect()
    }
    assert out == {"clean": 8, "half": 4, "dead": 1}  # floor at one probe


def test_adaptive_politeness_monotone_and_floor(spark):
    rows = [(f"d{k}", k, 8) for k in range(9)]
    out = adaptive_politeness(_stats(spark, rows), base_budget=8).collect()
    budgets = [r["budget"] for r in sorted(out, key=lambda r: r["n_ok"])]
    assert budgets == sorted(budgets)  # more failures never raise budget
    assert budgets[0] == 1  # 0 ok -> floor


def test_adaptive_politeness_zero_total_guard(spark):
    out = adaptive_politeness(_stats(spark, [("d", 0, 0)]), 8).collect()[0]
    assert out["budget"] == 1
