"""Politeness scheduling invariants (SURVEY.md §5.4)."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.operators.politeness import schedule_epoch
from etherscan_contract_crawler_spark.sources.seeds import seeds_to_frontier


def _pending(spark, seeds_df):
    frontier, _ = seeds_to_frontier(seeds_df, n_buckets=16)
    return frontier


def test_budget_never_exceeded(spark, tiny_seeds_df):
    pending = _pending(spark, tiny_seeds_df)
    sched = schedule_epoch(pending, epoch_duration_s=10)  # capacity 5*10=50
    per_domain = sched.groupBy("domain").count().collect()
    for r in per_domain:
        assert r["count"] <= 50, r
    # per-slot: no domain fetches more than max_calls in one slot
    per_slot = sched.groupBy("domain", "fetch_slot").count().collect()
    for r in per_slot:
        assert r["count"] <= 5, r


def test_ordering_is_canonical_within_domain(spark, tiny_seeds_df):
    sched = schedule_epoch(_pending(spark, tiny_seeds_df), epoch_duration_s=10)
    rows = sched.select("domain", "rn", "priority", "url_sha1").collect()
    by_domain = {}
    for r in rows:
        by_domain.setdefault(r.domain, []).append(r)
    for d, rs in by_domain.items():
        rs.sort(key=lambda r: r.rn)
        keys = [(-r.priority, r.url_sha1) for r in rs]
        assert keys == sorted(keys), d


def test_salting_is_lossless(spark, tiny_seeds_df):
    """Skew guard must not change the admitted set or ranks."""
    pending = _pending(spark, tiny_seeds_df)
    a = schedule_epoch(pending, epoch_duration_s=10, n_salts=1)
    b = schedule_epoch(pending, epoch_duration_s=10, n_salts=8)
    sa = {(r.url_sha1, r.rn, r.fetch_slot) for r in a.collect()}
    sb = {(r.url_sha1, r.rn, r.fetch_slot) for r in b.collect()}
    assert sa == sb


def test_batch_cap_takes_global_topk(spark, tiny_seeds_df):
    pending = _pending(spark, tiny_seeds_df)
    full = schedule_epoch(pending, epoch_duration_s=10)
    capped = schedule_epoch(pending, epoch_duration_s=10, batch_size=50)
    top = [
        r.url_sha1
        for r in full.orderBy(F.desc("priority"), F.asc("next_fetch_time"), F.asc("url_sha1"))
        .limit(50)
        .collect()
    ]
    got = [
        r.url_sha1
        for r in capped.orderBy(
            F.desc("priority"), F.asc("next_fetch_time"), F.asc("url_sha1")
        ).collect()
    ]
    assert got == top


def test_budget_dim_join(spark, tiny_seeds_df):
    pending = _pending(spark, tiny_seeds_df)
    domains = [r.domain for r in pending.select("domain").distinct().collect()]
    tight = domains[0]
    budgets = spark.createDataFrame(
        [(tight, 1, 5)], "domain string, max_calls int, period_s int"
    )
    sched = schedule_epoch(pending, budgets=budgets, epoch_duration_s=10)
    per_domain = {r.domain: r["count"] for r in sched.groupBy("domain").count().collect()}
    assert per_domain.get(tight, 0) <= 2  # 1 call * floor(10/5) slots
    for d, n in per_domain.items():
        if d != tight:
            assert n <= 50


def test_robots_filter(spark, tiny_seeds_df):
    pending = _pending(spark, tiny_seeds_df)
    d = pending.select("domain").distinct().collect()[0].domain
    robots = spark.createDataFrame([(d, ["/address/"])], "domain string, disallow array<string>")
    sched = schedule_epoch(pending, robots=robots, epoch_duration_s=10)
    assert sched.filter(F.col("domain") == d).count() == 0
    assert sched.count() > 0


def test_global_topk_matches_order_limit(spark):
    import random

    from etherscan_contract_crawler_spark.operators.politeness import (
        canonical_order,
        global_topk,
    )

    rng = random.Random(3)
    rows = [
        (
            f"k{rng.randrange(10**6):07d}",
            float(rng.randrange(100)),  # many priority ties
            "2026-01-01 00:00:00",
        )
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "url_sha1 string, priority double, nft string").select(
        "url_sha1", "priority", F.col("nft").cast("timestamp").alias("next_fetch_time")
    )
    for k in (1, 137, 4999, 5000, 9000):
        expect = [r["url_sha1"] for r in df.orderBy(*canonical_order()).limit(k).collect()]
        got = [
            r["url_sha1"]
            for r in global_topk(df, k).orderBy(*canonical_order()).collect()
        ]
        assert got == expect, k
