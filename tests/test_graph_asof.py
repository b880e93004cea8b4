"""PageRank (analytics/graph.py) and as-of join (operators/asof.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.graph import pagerank
from etherscan_contract_crawler_spark.operators.asof import asof_join


def _pr_numpy(edges, iters=3, d=0.85):
    """Independent dense re-derivation of the module's pinned semantics."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += pr[s] / outdeg[s]
        pr = {v: (1 - d) / n + d * contrib[v] for v in nodes}
    return pr


def test_pagerank_matches_dense_reference(spark):  # noqa: F811
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["pr"] for r in pagerank(df, iters=3).collect()}
    want = _pr_numpy(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)


def test_pagerank_dangling_and_star(spark):  # noqa: F811
    # node 9 is a pure sink (dangling): its mass is dropped per the pinned
    # simplified semantics — totals need not sum to 1, ordering still holds
    edges = [(i, 9) for i in range(1, 6)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["pr"] for r in pagerank(df, iters=3).collect()}
    want = _pr_numpy(edges)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    assert got[9] == max(got.values())  # the hub node dominates


def test_pagerank_empty(spark):  # noqa: F811
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, iters=2).count() == 0


def _ts(s):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=s)


def test_asof_basic_and_ties(spark):  # noqa: F811
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c"), (1, _ts(15), "d")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(15), 200.0), (3, _ts(1), 999.0)],
        "k long, ts timestamp, v double",
    )
    out = {
        (r["k"], r["tag"]): (r["v"], r["asof_ts"])
        for r in asof_join(left, right, on="k", ts="ts", right_cols=["v"]).collect()
    }
    assert out[(1, "a")] == (100.0, _ts(5))
    assert out[(1, "d")] == (200.0, _ts(15))  # inclusive: equal ts matches
    assert out[(1, "b")] == (200.0, _ts(15))
    assert out[(2, "c")] == (None, None)  # no right rows for key 2
    assert len(out) == 4


def test_asof_tolerance(spark):  # noqa: F811
    left = spark.createDataFrame(
        [(1, _ts(100), "x"), (1, _ts(104), "y")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame([(1, _ts(99), 7.0)], "k long, ts timestamp, v double")
    rows = asof_join(
        left, right, on="k", ts="ts", right_cols=["v"], tolerance_s=3
    ).collect()
    got = {r["tag"]: (r["v"], r["asof_ts"]) for r in rows}
    assert got["x"] == (7.0, _ts(99))
    assert got["y"] == (None, None)  # 5s back > 3s tolerance


def test_range_join_matches_bruteforce(spark):  # noqa: F811
    import random

    from etherscan_contract_crawler_spark.operators.rangejoin import range_join

    rng = random.Random(7)
    lrows = [(rng.randrange(5), rng.randrange(1000), i) for i in range(200)]
    rrows = [(rng.randrange(5), rng.randrange(1000), 1000 + i) for i in range(200)]
    left = spark.createDataFrame(lrows, "k long, lts long, lid long")
    right = spark.createDataFrame(rrows, "k long, rts long, rid long")
    w = 37
    got = {
        (r["lid"], r["rid"])
        for r in range_join(
            left, right, on="k", left_ts="lts", right_ts="rts", window_s=w
        ).collect()
    }
    want = {
        (lid, rid)
        for (lk, lts, lid) in lrows
        for (rk, rts, rid) in rrows
        if lk == rk and abs(lts - rts) <= w
    }
    assert got == want


def test_range_join_replicate_left_and_boundary(spark):  # noqa: F811
    from etherscan_contract_crawler_spark.operators.rangejoin import range_join

    # pairs exactly at the bound, just inside, just outside, bucket edges
    left = spark.createDataFrame(
        [(1, 100, 1), (1, 199, 2), (1, 0, 3)], "k long, lts long, lid long"
    )
    right = spark.createDataFrame(
        [(1, 150, 10), (1, 250, 11), (1, 49, 12), (1, 151, 13)],
        "k long, rts long, rid long",
    )
    out = range_join(
        left, right, on="k", left_ts="lts", right_ts="rts", window_s=50,
        replicate="left",
    )
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    # 100<->150 = 50 (inclusive bound); 199<->150 = 49; 199<->151 = 48;
    # 0<->49 = 49; 100<->49 and 199<->250 are 51 — outside
    assert got == {(1, 10), (2, 10), (2, 13), (3, 12)}


def test_asof_single_shuffle_plan(spark):  # noqa: F811
    """The whole as-of is one Exchange + one Window — no join node at all."""
    left = spark.createDataFrame([(1, _ts(1), "a")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(0), 1.0)], "k long, ts timestamp, v double")
    plan = (
        asof_join(left, right, on="k", ts="ts", right_cols=["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2  # one for the window (+1 AQE artifact max)
