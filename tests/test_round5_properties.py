"""Property-based invariants for the round-5 operator batch: compaction
bins obey the greedy close rule and never mix partitions, curriculum
positions are always a gap-free permutation respecting bucket order,
rendezvous rescale moves land only in new slots, and the LM filter's
scores stay inside the model's provable bounds."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from etherscan_contract_crawler_spark.analytics.sampling import curriculum_order
from etherscan_contract_crawler_spark.analytics.text import lm_perplexity_filter
from etherscan_contract_crawler_spark.operators.politeness import rendezvous_assign
from etherscan_contract_crawler_spark.storage.maintenance import (
    rewrite_data_files_plan,
)

filerec = st.tuples(
    st.integers(min_value=0, max_value=3),     # part_id
    st.integers(min_value=1, max_value=900),   # n_bytes
)


@settings(max_examples=8, deadline=None)
@given(st.lists(filerec, min_size=1, max_size=40))
def test_compaction_bins_obey_greedy_rule(spark, recs):
    rows = [(p, i, b) for i, (p, b) in enumerate(recs)]
    df = spark.createDataFrame(rows, ["part_id", "file_id", "n_bytes"])
    out = rewrite_data_files_plan(
        df, target_bytes=1000, small_threshold=500, min_input_files=2
    ).collect()
    by_part: dict = {}
    for r in out:
        if r["bin"] is not None:
            by_part.setdefault(r["part_id"], []).append(r)
        else:
            assert r["n_bytes"] >= 500 and not r["do_rewrite"]
    for rs in by_part.values():
        rs.sort(key=lambda r: (r["file_id"], r["n_bytes"]))
        cum, bin_sizes = 0, {}
        for r in rs:
            assert r["n_bytes"] < 500
            assert r["bin"] == cum // 1000  # greedy close-when-full rule
            cum += r["n_bytes"]
            bin_sizes[r["bin"]] = bin_sizes.get(r["bin"], 0) + 1
        for r in rs:
            assert r["do_rewrite"] == (bin_sizes[r["bin"]] >= 2)


diff = st.integers(min_value=0, max_value=10_000)


@settings(max_examples=6, deadline=None)
@given(st.lists(diff, min_size=1, max_size=60), st.integers(2, 9))
def test_curriculum_always_gapfree_bucket_ordered(spark, diffs, k):
    rows = [(i, d) for i, d in enumerate(diffs)]
    df = spark.createDataFrame(rows, ["doc_id", "difficulty"])
    out = curriculum_order(df, n_buckets=k).collect()
    assert sorted(r["position"] for r in out) == list(range(1, len(rows) + 1))
    # position order never violates bucket order
    by_pos = sorted(out, key=lambda r: r["position"])
    for a, b in zip(by_pos, by_pos[1:]):
        assert a["bucket"] <= b["bucket"]
    # bucket range is valid
    assert all(0 <= r["bucket"] < k for r in out)


@settings(max_examples=4, deadline=None)
@given(st.integers(2, 12), st.integers(1, 12))
def test_rendezvous_moves_only_into_new_slots(spark, n_prev, n_extra):
    n_new = n_prev + n_extra
    domains = spark.createDataFrame(
        [(f"h{i}",) for i in range(150)], ["domain"]
    )
    out = rendezvous_assign(domains, n_slots=n_new, prev_slots=n_prev).collect()
    for r in out:
        assert 0 <= r["slot"] < n_new and 0 <= r["prev_slot"] < n_prev
        if r["moved"]:
            # HRW: adding slots can only steal domains INTO the new slots
            assert r["slot"] >= n_prev
        else:
            assert r["slot"] == r["prev_slot"]


words = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=2, max_size=12
)


@settings(max_examples=6, deadline=None)
@given(st.lists(words, min_size=2, max_size=15))
def test_lm_scores_within_model_bounds(spark, docs):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = lm_perplexity_filter(df, ref_mod=2, max_neg_logp=5.0).collect()
    # reference slice: even doc ids; bounds: every per-bigram value is in
    # [0, ln(c1_max + V)] — zero when the model gives the bigram
    # probability exactly 1 (add-one with c2 = c1, V = 1). c1_max <=
    # total ref bigrams, V <= 5.
    n_ref_bigrams = sum(len(ws) - 1 for i, ws in enumerate(docs) if i % 2 == 0)
    upper = math.log(max(n_ref_bigrams, 1) + 5) + 1e-9
    for r in out:
        assert 0 <= r["neg_logp"] <= upper
        assert r["n_bigrams"] >= 1
