"""Round-4 batch 2: depth-decayed admission, mixture planning, PMI
collocations, continuous recrawl-interval estimation — the branch
semantics the DuckDB oracles can't pin alone (budget floor at deep
levels, repeat-vs-sample branches, PMI ordering/tie-break, the
never-changed span rule)."""

import math

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.sampling import mixture_plan
from etherscan_contract_crawler_spark.analytics.text import pmi_collocations
from etherscan_contract_crawler_spark.operators.politeness import depth_budget
from etherscan_contract_crawler_spark.operators.recrawl import (
    recrawl_interval_estimate,
)


# ------------------------------------------------------------- depth_budget
def test_depth_budget_halves_per_level_and_floors_at_one(spark):
    # depth 0: budget 4; depth 1: 2; depth 2: 1; depth 9: still 1
    rows = []
    for i in range(3):
        rows.append((f"a{i}", "d1", "", 10.0 - i))          # depth 0
    for i in range(3):
        rows.append((f"b{i}", "d1", "/x", 10.0 - i))        # depth 1
    for i in range(2):
        rows.append((f"c{i}", "d1", "/x/y", 10.0 - i))      # depth 2
    rows.append(("e0", "d1", "/1/2/3/4/5/6/7/8/9", 1.0))    # depth 9
    df = spark.createDataFrame(rows, ["url_key", "domain", "path", "priority"])
    out = {
        r["url_key"]: (r["depth"], r["admitted"])
        for r in depth_budget(df, base_budget=4).collect()
    }
    assert out["a0"] == (0, True) and out["a2"] == (0, True)  # 3 <= 4
    assert out["b0"] == (1, True) and out["b1"] == (1, True)
    assert out["b2"] == (1, False)  # rank 3 > budget 2
    assert out["c0"] == (2, True) and out["c1"] == (2, False)
    assert out["e0"] == (9, True)  # floor at 1 admits the first


def test_depth_budget_counts_nonempty_segments_only(spark):
    df = spark.createDataFrame(
        [("k1", "d1", "//x//y/", 1.0)], ["url_key", "domain", "path", "priority"]
    )
    assert depth_budget(df).collect()[0]["depth"] == 2


# ------------------------------------------------------------- mixture_plan
def test_mixture_plan_sample_down_and_repeat_branches(spark):
    st = spark.createDataFrame(
        [("web", 1000), ("code", 100)], ["source", "n_tokens"]
    )
    tgt = spark.createDataFrame(
        [("web", 0.5), ("code", 0.5)], ["source", "target_share"]
    )
    out = {r["source"]: r for r in mixture_plan(st, tgt, 1000).collect()}
    # web: want 500 of 1000 -> rate .5, one epoch
    assert out["web"]["want_tokens"] == 500
    assert math.isclose(out["web"]["sample_rate"], 0.5)
    assert out["web"]["repeat_factor"] == 1
    # code: want 500 of 100 -> rate 1.0, ceil(500/100) = 5 epochs
    assert out["code"]["sample_rate"] == 1.0
    assert out["code"]["repeat_factor"] == 5


def test_mixture_plan_integer_ceil_is_exact(spark):
    st = spark.createDataFrame([("s", 3)], ["source", "n_tokens"])
    tgt = spark.createDataFrame([("s", 1.0)], ["source", "target_share"])
    out = mixture_plan(st, tgt, 7).collect()[0]
    assert out["repeat_factor"] == 3  # ceil(7/3)


def test_mixture_plan_drops_sources_without_targets(spark):
    st = spark.createDataFrame([("a", 10), ("b", 10)], ["source", "n_tokens"])
    tgt = spark.createDataFrame([("a", 1.0)], ["source", "target_share"])
    assert [r["source"] for r in mixture_plan(st, tgt, 10).collect()] == ["a"]


# --------------------------------------------------------- pmi_collocations
def test_pmi_collocations_finds_the_glued_pair(spark):
    # "aa bb" always co-occur; "cc" pairs with many different words
    docs = spark.createDataFrame(
        [("aa bb cc dd",), ("aa bb cc ee",), ("aa bb cc ff",)], ["text"]
    )
    out = pmi_collocations(docs, min_count=3, top_k=5).collect()
    grams = [r["gram"] for r in out]
    assert "aa bb" in grams and "bb cc" in grams
    by = {r["gram"]: r for r in out}
    # p(aa bb)=3/9; p(aa)=p(bb)=3/12 -> pmi = ln((3/9)/((3/12)^2)) = ln(16/3)
    assert math.isclose(by["aa bb"]["pmi"], round(math.log(16 / 3), 6))
    assert by["aa bb"]["n_pair"] == 3
    # deterministic ordering: equal-pmi grams sort lexicographically
    pmis = [r["pmi"] for r in out]
    assert pmis == sorted(pmis, reverse=True)


def test_pmi_collocations_min_count_drops_hapax(spark):
    docs = spark.createDataFrame([("xx yy",), ("xx zz",)], ["text"])
    out = pmi_collocations(docs, min_count=2, top_k=10).collect()
    assert [r["gram"] for r in out] == []  # every bigram occurs once


# ------------------------------------------------------- recrawl_interval
def _caps(spark, rows):
    df = spark.createDataFrame(rows, ["url_key", "ts_s", "fingerprint"])
    return df.select(
        "url_key",
        F.timestamp_seconds(F.col("ts_s")).alias("ts"),
        "fingerprint",
    )


def test_recrawl_interval_expected_time_between_changes(spark):
    # 4 captures over 300 s, 2 changes -> avg_gap 100, recrawl 150
    rows = [
        ("u1", 0, "a"),
        ("u1", 100, "a"),
        ("u1", 200, "b"),
        ("u1", 300, "c"),
    ]
    out = recrawl_interval_estimate(_caps(spark, rows)).collect()[0]
    assert (out["n_obs"], out["n_changes"]) == (4, 2)
    assert out["avg_gap_s"] == 100
    assert out["recrawl_s"] == 150


def test_recrawl_interval_never_changed_gets_full_span(spark):
    rows = [("u1", 0, "a"), ("u1", 50, "a"), ("u1", 400, "a")]
    out = recrawl_interval_estimate(_caps(spark, rows)).collect()[0]
    assert out["n_changes"] == 0
    assert out["recrawl_s"] == 400  # span / max(0, 1)


def test_recrawl_interval_single_capture_dropped(spark):
    rows = [("u1", 0, "a"), ("u2", 0, "a"), ("u2", 10, "b")]
    out = recrawl_interval_estimate(_caps(spark, rows)).collect()
    assert [r["url_key"] for r in out] == ["u2"]
