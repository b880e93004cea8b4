"""Round-4 final batch: WARC segment packing, per-IP politeness admission,
frontier GC, TrustRank, token-distribution shift — the semantics the
per-query DuckDB oracles can't pin alone (segment overrun rule, slot
stacking within one IP group, seen-over-dead precedence, trusted-only
teleport mass, KL = 0 for a corpus-identical group)."""

import math

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.graph import trustrank
from etherscan_contract_crawler_spark.analytics.packing import warc_pack
from etherscan_contract_crawler_spark.analytics.text import token_dist_shift
from etherscan_contract_crawler_spark.operators.dedup import frontier_gc
from etherscan_contract_crawler_spark.operators.politeness import ip_admission


# ---------------------------------------------------------------- warc_pack
def test_warc_pack_greedy_segment_rule_and_offsets(spark):
    # one shard, target 100 bytes, sizes 60/60/60: the greedy writer keeps
    # rec b in segment 0 (closes AFTER reaching the target — segments may
    # overrun by one record, records never split), so seg 1 starts at c.
    rows = [("a", 0, 60), ("b", 0, 60), ("c", 0, 60)]
    df = spark.createDataFrame(rows, ["url_key", "shard", "n_bytes"])
    out = {
        r["url_key"]: (r["seg_idx"], r["seg_offset"])
        for r in warc_pack(df, segment_bytes=100).collect()
    }
    assert out == {"a": (0, 0), "b": (0, 60), "c": (1, 0)}


def test_warc_pack_shards_pack_independently(spark):
    rows = [("a", 0, 90), ("b", 0, 20), ("x", 1, 10), ("y", 1, 10)]
    df = spark.createDataFrame(rows, ["url_key", "shard", "n_bytes"])
    out = {
        r["url_key"]: (r["shard"], r["seg_idx"], r["seg_offset"])
        for r in warc_pack(df, segment_bytes=100).collect()
    }
    # shard 1's cumulative bytes never see shard 0's 90
    assert out["x"] == (1, 0, 0) and out["y"] == (1, 0, 10)
    assert out["b"] == (0, 0, 90)


def test_warc_pack_offset_restarts_each_segment(spark):
    # sizes 40,40,40,40 target 100: segs 0,0,0(cum 80 <100? cum_before of
    # third rec = 80 -> seg 0), fourth cum_before=120 -> seg 1 offset 0
    rows = [(f"k{i}", 0, 40) for i in range(4)]
    df = spark.createDataFrame(rows, ["url_key", "shard", "n_bytes"])
    got = {
        r["url_key"]: (r["seg_idx"], r["seg_offset"])
        for r in warc_pack(df, segment_bytes=100).collect()
    }
    assert got == {"k0": (0, 0), "k1": (0, 40), "k2": (0, 80), "k3": (1, 0)}


# ------------------------------------------------------------- ip_admission
def test_ip_admission_stacks_slots_within_ip_group(spark):
    # same domain -> same ip_group; budget 2 -> slots 0,0,1,1 in priority
    # order (desc), tie-broken by url_key
    rows = [
        ("k1", "one.example", 9.0),
        ("k2", "one.example", 8.0),
        ("k3", "one.example", 7.0),
        ("k4", "one.example", 6.0),
    ]
    df = spark.createDataFrame(rows, ["url_key", "domain", "priority"])
    out = {
        r["url_key"]: r["fetch_slot"]
        for r in ip_admission(df, budget_per_ip=2).collect()
    }
    assert out == {"k1": 0, "k2": 0, "k3": 1, "k4": 1}


def test_ip_admission_groups_by_md5_prefix_not_domain(spark):
    # prefix_len=0 would be one group; use 6 and check the group id IS the
    # md5 prefix so a production DNS dim can replace it transparently
    import hashlib

    rows = [("k1", "a.example", 1.0), ("k2", "b.example", 1.0)]
    df = spark.createDataFrame(rows, ["url_key", "domain", "priority"])
    out = {r["url_key"]: r["ip_group"] for r in ip_admission(df).collect()}
    assert out["k1"] == hashlib.md5(b"a.example").hexdigest()[:6]
    assert out["k2"] == hashlib.md5(b"b.example").hexdigest()[:6]


# -------------------------------------------------------------- frontier_gc
def test_frontier_gc_counts_and_seen_precedence(spark):
    frontier = spark.createDataFrame(
        [("k1", "d1"), ("k2", "d1"), ("k3", "d1"), ("k4", "d2")],
        ["url_key", "domain"],
    )
    seen = spark.createDataFrame([("k2",), ("k3",)], ["url_key"])
    dead = spark.createDataFrame([("k3",), ("k4",)], ["url_key"])
    out = {
        r["domain"]: (r["kept"], r["dropped_seen"], r["dropped_dead"])
        for r in frontier_gc(frontier, seen, dead).collect()
    }
    # k3 is in BOTH -> counts as dropped_seen (seen wins), never double
    assert out["d1"] == (1, 2, 0)
    assert out["d2"] == (0, 0, 1)


def test_frontier_gc_duplicate_probe_keys_do_not_multiply(spark):
    frontier = spark.createDataFrame([("k1", "d1")], ["url_key", "domain"])
    seen = spark.createDataFrame([("k1",), ("k1",)], ["url_key"])
    dead = spark.createDataFrame([], "url_key string")
    out = frontier_gc(frontier, seen, dead).collect()[0]
    assert (out["kept"], out["dropped_seen"], out["dropped_dead"]) == (0, 1, 0)


# ---------------------------------------------------------------- trustrank
def test_trustrank_mass_stays_near_trusted_seeds(spark):
    # chain: 0 -> 1 -> 2, trusted = {0}. r0 = (1,0,0);
    # iter1: tr0 = .15, tr1 = .85*1 = .85, tr2 = 0 + .85*0 = 0
    # iter2: tr0 = .15, tr1 = .85*.15 = .1275, tr2 = .85*.85 = .7225
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    trusted = spark.createDataFrame([(0,)], ["id"])
    out = {
        r["id"]: r["tr"] for r in trustrank(edges, trusted, iters=2).collect()
    }
    assert math.isclose(out[0], 0.15)
    assert math.isclose(out[1], 0.1275)
    assert math.isclose(out[2], 0.7225)


def test_trustrank_zero_for_unreachable_spam_island(spark):
    # spam farm 10 <-> 11 linking only to itself gets NOTHING: no teleport
    # (untrusted) and no in-links from the trusted component — the property
    # that distinguishes trustrank from pagerank (which gives every node
    # (1-d)/N for free)
    edges = spark.createDataFrame(
        [(0, 1), (10, 11), (11, 10)], ["src", "dst"]
    )
    trusted = spark.createDataFrame([(0,)], ["id"])
    out = {
        r["id"]: r["tr"] for r in trustrank(edges, trusted, iters=3).collect()
    }
    assert out[10] == 0.0 and out[11] == 0.0
    assert out[1] > 0.0


def test_trustrank_empty_trusted_set_is_all_zero(spark):
    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    trusted = spark.createDataFrame([], "id long")
    out = trustrank(edges, trusted, iters=2).collect()
    assert all(r["tr"] == 0.0 for r in out)


# --------------------------------------------------------- token_dist_shift
def test_token_dist_shift_zero_for_corpus_identical_groups(spark):
    # two groups with IDENTICAL token distributions -> each equals the
    # corpus distribution -> KL exactly 0 (after the shared 6-dp rounding)
    docs = spark.createDataFrame(
        [("s1", "aa bb aa"), ("s2", "aa bb aa")], ["source", "text"]
    )
    out = {r["source"]: r["kl_nats"] for r in token_dist_shift(docs).collect()}
    assert out == {"s1": 0.0, "s2": 0.0}


def test_token_dist_shift_hand_value(spark):
    # s1 = {a:1}, s2 = {b:1}; corpus = {a:1/2, b:1/2}
    # KL(s1||corpus) = 1*ln(1/.5) = ln 2 for both groups
    docs = spark.createDataFrame([("s1", "a"), ("s2", "b")], ["source", "text"])
    out = {r["source"]: r["kl_nats"] for r in token_dist_shift(docs).collect()}
    assert math.isclose(out["s1"], round(math.log(2), 6))
    assert math.isclose(out["s2"], round(math.log(2), 6))


def test_token_dist_shift_normalizes_case_and_whitespace(spark):
    docs = spark.createDataFrame(
        [("s1", "  AA   aa "), ("s2", "aa aa")], ["source", "text"]
    )
    rows = token_dist_shift(docs).collect()
    assert {r["source"]: r["n_tokens"] for r in rows} == {"s1": 2, "s2": 2}
    assert all(r["kl_nats"] == 0.0 for r in rows)
