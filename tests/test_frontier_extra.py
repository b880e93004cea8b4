"""HITS (analytics/graph.py:hits), crawl-trap signals
(functions/urls.py:trap_signals), and re-crawl lanes (operators/recrawl.py).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.graph import hits
from etherscan_contract_crawler_spark.functions.urls import trap_signals
from etherscan_contract_crawler_spark.operators.recrawl import recrawl_lanes


def _hits_dense(edges, iters=2):
    """Independent dense re-derivation of the module's pinned semantics."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    h = {v: 1.0 for v in nodes}
    a = {v: 0.0 for v in nodes}
    for _ in range(iters):
        a = {v: sum(h[s] for s, t in edges if t == v) for v in nodes}
        sa = sum(a.values())
        a = {v: x / sa for v, x in a.items()}
        h = {v: sum(a[t] for s, t in edges if s == v) for v in nodes}
        sh = sum(h.values())
        h = {v: x / sh for v, x in h.items()}
    return h, a


def test_hits_matches_dense_reference(spark):  # noqa: F811
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = hits(df, iters=2).collect()
    got_h = {r["id"]: r["hub"] for r in rows}
    got_a = {r["id"]: r["authority"] for r in rows}
    want_h, want_a = _hits_dense(edges)
    assert set(got_h) == set(want_h)
    for v in want_h:
        assert got_h[v] == pytest.approx(want_h[v], rel=1e-12)
        assert got_a[v] == pytest.approx(want_a[v], rel=1e-12)
    # node 3 is linked from every hub: the top authority; node 4 links to
    # the two best authorities: the top hub
    assert max(got_a, key=got_a.get) == 3
    assert max(got_h, key=got_h.get) == 4


def test_hits_l1_normalized(spark):  # noqa: F811
    edges = [(i, (i * 7) % 23) for i in range(40) if i != (i * 7) % 23]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = hits(df, iters=2).collect()
    assert sum(r["hub"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(r["authority"] for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_trap_signals_cases(spark):  # noqa: F811
    cases = [
        # (url, depth, n_params, n_repeated, is_trap)
        ("https://a.com/x/y/z", 3, 0, 0, False),
        ("https://a.com/a/b/a/b/a/b", 6, 0, 4, True),  # loop: repeats >= depth/2
        ("https://a.com/" + "/".join(f"s{i}" for i in range(12)), 12, 0, 0, True),
        ("https://a.com/x?p1=1&p2=2&p3=3&p4=4", 1, 4, 0, True),  # param explosion
        ("https://a.com/x/y?a=1&b=2", 2, 2, 0, False),
        ("https://a.com/", 0, 0, 0, False),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    got = {
        r["url"]: r["s"]
        for r in df.select("url", trap_signals("url").alias("s")).collect()
    }
    for url, depth, n_params, n_repeated, is_trap in cases:
        s = got[url]
        assert (s["depth"], s["n_params"], s["n_repeated"], s["is_trap"]) == (
            depth, n_params, n_repeated, is_trap,
        ), url


def test_recrawl_lanes(spark):  # noqa: F811
    t0 = datetime.datetime(2026, 1, 1)

    def obs(url_id, seq, fp):
        return (url_id, t0 + datetime.timedelta(hours=seq), seq, fp)

    rows = (
        # url 1: changes on every visit -> hourly
        [obs(1, i, f"v{i}") for i in range(4)]
        # url 2: never changes -> weekly
        + [obs(2, i, "same") for i in range(5)]
        # url 3: 1 change over 9 intervals (10%) -> daily (boundary: 2*1 < 9,
        # 10*1 >= 9)
        + [obs(3, i, "a" if i < 9 else "b") for i in range(10)]
        # url 4: single visit -> default daily
        + [obs(4, 0, "x")]
    )
    df = spark.createDataFrame(
        rows, "url_id long, ts timestamp, obs_id long, fingerprint string"
    )
    got = {r["url_id"]: r for r in recrawl_lanes(df).collect()}
    assert got[1]["lane"] == "hourly" and got[1]["n_changes"] == 3
    assert got[2]["lane"] == "weekly" and got[2]["n_changes"] == 0
    assert got[3]["lane"] == "daily" and got[3]["n_changes"] == 1
    assert got[4]["lane"] == "daily" and got[4]["n_obs"] == 1


def test_recrawl_single_exchange(spark):  # noqa: F811
    # the window and the groupBy share the url_id hash-partitioning: the
    # physical plan must contain exactly ONE exchange
    df = spark.createDataFrame(
        [(i % 7, datetime.datetime(2026, 1, 1 + i % 20), i, f"f{i % 3}")
         for i in range(200)],
        "url_id long, ts timestamp, obs_id long, fingerprint string",
    )
    plan = recrawl_lanes(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_query_registry_consistent():
    """Every _NEWEST_FIRST name is registered, every oracle has a query,
    and queries() puts every never-driver-checked query (DRIVER_SEEN.json)
    ahead of every driver-checked one, preserving _NEWEST_FIRST's relative
    order within each class (r4 VERDICT #1 rotation)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    assert set(entry_mod._NEWEST_FIRST) <= set(qs)
    assert set(entry_mod.oracle_sql()) <= set(qs)
    seen = entry_mod._driver_seen()
    assert seen, "DRIVER_SEEN.json must exist and be non-empty"
    names = list(qs)
    first_seen_idx = min(i for i, n in enumerate(names) if n in seen)
    assert all(n in seen for n in names[first_seen_idx:]), (
        "a never-driver-checked query sorted after a driver-checked one"
    )
    nf = [n for n in entry_mod._NEWEST_FIRST if n in qs]
    for cls in (lambda n: n not in seen, lambda n: n in seen):
        sub = [n for n in names if cls(n) and n in set(nf)]
        want = [n for n in nf if cls(n)]
        assert sub == want, "newest-first relative order broken within class"
    # rows-only by design stays exactly this set (approximate ANN results +
    # binary image codecs — none SQL-expressible; everything else must
    # carry a DuckDB oracle)
    no_oracle = set(qs) - set(entry_mod.oracle_sql())
    assert no_oracle == {"ann_lsh_topk", "ann_ivf_topk",
                         "images_decode_validate", "image_channel_stats",
                         "image_blur_gate", "image_curation",
                         "image_watermark_gate", "hard_negative_mine_lsh"}
