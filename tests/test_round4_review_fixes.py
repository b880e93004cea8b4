"""Regression pins for the round-4 code-review findings: shiftright wrap
at spider-trap depths, trusted-seed node universe, unbudgeted-domain
surfacing, missing-source mixture rows, string-keyed BFS, and the GC
row-keeping companion."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.graph import (
    seed_hop_distance,
    trustrank,
)
from etherscan_contract_crawler_spark.analytics.sampling import mixture_plan
from etherscan_contract_crawler_spark.operators.dedup import frontier_gc_keep
from etherscan_contract_crawler_spark.operators.politeness import (
    depth_budget,
    rate_compliance_audit,
)


def test_depth_budget_no_shift_wrap_at_depth_32(spark):
    # Java shift masking would give shiftright(16, 32) == 16 — the deepest
    # spider-trap URLs would win the FULL budget back. Must floor at 1.
    deep = "/s" * 32
    rows = [(f"k{i}", "d1", deep, 10.0 - i) for i in range(3)]
    df = spark.createDataFrame(rows, ["url_key", "domain", "path", "priority"])
    out = depth_budget(df, base_budget=16).collect()
    assert all(r["depth"] == 32 for r in out)
    assert sorted(r["admitted"] for r in out) == [False, False, True]


def test_trustrank_keeps_isolated_trusted_seed(spark):
    # seed B has no harvested links yet: it must still appear with its
    # teleport mass, and A's teleport must NOT be deflated below 1/|T|
    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    trusted = spark.createDataFrame([(0,), (99,)], ["id"])
    out = {r["id"]: r["tr"] for r in trustrank(edges, trusted, iters=2).collect()}
    assert 99 in out
    assert abs(out[99] - 0.15 * 0.5) < 1e-12  # (1-d) * 1/|T|
    assert abs(out[0] - 0.15 * 0.5) < 1e-12
    assert abs(out[1] - (0.85 * 0.15 * 0.5)) < 1e-12


def test_rate_compliance_surfaces_unbudgeted_domain(spark):
    # domain missing from the budgets dim stays in the report, audited
    # against the DEFAULT_MAX_CALLS=5 fallback
    log = spark.createDataFrame(
        [("ghost", t) for t in [0, 0, 0, 0, 0, 0]], ["domain", "ts_s"]
    )
    budgets = spark.createDataFrame([("other", 3)], ["domain", "max_per_window"])
    out = {r["domain"]: r for r in rate_compliance_audit(log, budgets, 10).collect()}
    assert "ghost" in out
    assert out["ghost"]["peak_in_window"] == 6
    assert out["ghost"]["compliant"] is False  # 6 > default 5


def test_mixture_plan_surfaces_missing_source(spark):
    st = spark.createDataFrame([("web", 100)], ["source", "n_tokens"])
    tgt = spark.createDataFrame(
        [("web", 0.5), ("ghost", 0.5)], ["source", "target_share"]
    )
    out = {r["source"]: r for r in mixture_plan(st, tgt, 100).collect()}
    assert "ghost" in out  # visible, not silently dropped
    g = out["ghost"]
    assert (g["n_tokens"], g["sample_rate"], g["repeat_factor"]) == (0, 0.0, 0)
    assert g["want_tokens"] == 50


def test_seed_hop_distance_accepts_string_ids(spark):
    edges = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "c.com")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a.com",)], ["id"])
    out = {r["id"]: r["hops"] for r in seed_hop_distance(edges, seeds, 2).collect()}
    assert out == {"a.com": 0, "b.com": 1, "c.com": 2}


def test_frontier_gc_keep_matches_the_audit(spark):
    frontier = spark.createDataFrame(
        [("k1", "d1"), ("k2", "d1"), ("k3", "d1"), ("k4", "d2")],
        ["url_key", "domain"],
    )
    seen = spark.createDataFrame([("k2",), ("k3",)], ["url_key"])
    dead = spark.createDataFrame([("k3",), ("k4",)], ["url_key"])
    kept = sorted(r["url_key"] for r in frontier_gc_keep(frontier, seen, dead).collect())
    assert kept == ["k1"]
