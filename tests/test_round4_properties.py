"""Property-based invariants for the round-4 final operator batches:
WARC packing reconstructs a contiguous byte stream per segment, IP/depth
admission never overfills a budget, mixture planning brackets the target,
and the recrawl estimator stays inside the observed span."""

from hypothesis import given, settings
from hypothesis import strategies as st

from etherscan_contract_crawler_spark.analytics.packing import warc_pack
from etherscan_contract_crawler_spark.analytics.sampling import mixture_plan
from etherscan_contract_crawler_spark.operators.politeness import (
    depth_budget,
    ip_admission,
)
from etherscan_contract_crawler_spark.operators.recrawl import (
    recrawl_interval_estimate,
)

rec = st.tuples(
    st.integers(min_value=0, max_value=3),      # shard
    st.integers(min_value=1, max_value=500),    # n_bytes
)


@settings(max_examples=8, deadline=None)
@given(st.lists(rec, min_size=1, max_size=40))
def test_warc_pack_segments_are_contiguous_byte_streams(spark, recs):
    rows = [(f"k{i:04d}", s, b) for i, (s, b) in enumerate(recs)]
    df = spark.createDataFrame(rows, ["url_key", "shard", "n_bytes"])
    out = sorted(
        warc_pack(df, segment_bytes=700).collect(),
        key=lambda r: (r["shard"], r["url_key"]),
    )
    by_seg = {}
    for r in out:
        by_seg.setdefault((r["shard"], r["seg_idx"]), []).append(r)
    for (_, seg), rs in by_seg.items():
        # within a segment (records already in shard order): offsets start
        # at 0 and each record starts where the previous ended
        assert rs[0]["seg_offset"] == 0
        for a, b in zip(rs, rs[1:]):
            assert b["seg_offset"] == a["seg_offset"] + a["n_bytes"]
        # greedy close rule: only the LAST record may cross the target
        for r in rs[:-1]:
            assert r["seg_offset"] < 700
    # seg_idx is monotone in shard order
    for shard in {r["shard"] for r in out}:
        segs = [r["seg_idx"] for r in out if r["shard"] == shard]
        assert segs == sorted(segs)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a.com", "b.com", "c.net"]),
            st.floats(min_value=0, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_ip_admission_no_slot_overfill(spark, rows, budget):
    df = spark.createDataFrame(
        [(f"k{i:03d}", d, p) for i, (d, p) in enumerate(rows)],
        ["url_key", "domain", "priority"],
    )
    out = ip_admission(df, budget_per_ip=budget).collect()
    per_slot = {}
    for r in out:
        per_slot.setdefault((r["ip_group"], r["fetch_slot"]), 0)
        per_slot[(r["ip_group"], r["fetch_slot"])] += 1
    assert all(c <= budget for c in per_slot.values())
    # slots are contiguous from 0 per group: slot s+1 implies slot s full
    groups = {g for g, _ in per_slot}
    for g in groups:
        slots = sorted(s for gg, s in per_slot if gg == g)
        assert slots == list(range(len(slots)))
        for s in slots[:-1]:
            assert per_slot[(g, s)] == budget


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["d1", "d2"]),
            st.integers(min_value=0, max_value=4),  # depth
        ),
        min_size=1,
        max_size=30,
    )
)
def test_depth_budget_admits_exactly_min_budget_groupsize(spark, rows):
    data = [
        (f"k{i:03d}", d, "/s" * dep, float(i % 7)) for i, (d, dep) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, ["url_key", "domain", "path", "priority"])
    out = depth_budget(df, base_budget=8).collect()
    per = {}
    adm = {}
    for r in out:
        k = (r["domain"], r["depth"])
        per[k] = per.get(k, 0) + 1
        adm[k] = adm.get(k, 0) + (1 if r["admitted"] else 0)
    for k, n in per.items():
        budget = max(8 >> k[1], 1)
        assert adm[k] == min(budget, n)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),  # n_tokens
            st.integers(min_value=1, max_value=64),      # weight numerator /64
        ),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    st.integers(min_value=1, max_value=1_000_000),
)
def test_mixture_plan_brackets_the_target(spark, rows, budget):
    st_df = spark.createDataFrame(
        [(f"s{i}", n) for i, (n, _) in enumerate(rows)], ["source", "n_tokens"]
    )
    tgt = spark.createDataFrame(
        [(f"s{i}", w / 64.0) for i, (_, w) in enumerate(rows)],
        ["source", "target_share"],
    )
    for r in mixture_plan(st_df, tgt, budget).collect():
        assert r["repeat_factor"] >= 1
        # enough epochs to cover the want...
        assert r["repeat_factor"] * r["n_tokens"] >= r["want_tokens"]
        # ...but never a whole epoch more than needed
        if r["repeat_factor"] > 1:
            assert (r["repeat_factor"] - 1) * r["n_tokens"] < r["want_tokens"]
        assert 0.0 <= r["sample_rate"] <= 1.0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100_000),  # ts_s
            st.sampled_from(["a", "b", "c"]),             # fingerprint
        ),
        min_size=2,
        max_size=25,
    )
)
def test_recrawl_interval_stays_inside_observed_span(spark, caps):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("u", t, fp) for t, fp in caps], ["url_key", "ts_s", "fingerprint"]
    ).select("url_key", F.timestamp_seconds("ts_s").alias("ts"), "fingerprint")
    out = recrawl_interval_estimate(df).collect()
    assert len(out) == 1
    r = out[0]
    span = max(t for t, _ in caps) - min(t for t, _ in caps)
    assert 0 <= r["n_changes"] <= r["n_obs"] - 1
    assert r["avg_gap_s"] == span // (r["n_obs"] - 1)
    assert 0 <= r["recrawl_s"] <= span or (span == 0 and r["recrawl_s"] == 0)
