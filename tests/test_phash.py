"""Banded phash near-dup join: brute-force equality (the pigeonhole
exactness claim), skew cutoff semantics, and the no-cartesian plan shape."""

import itertools

import pytest
from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.phash import phash_neardup_pairs


def _corpus(spark, n=120, seed=7):
    """Deterministic 60-bit hashes with planted near-dup clusters: every
    id % 10 == 0 row spawns two perturbed copies at Hamming 1 and 3."""
    import random

    rng = random.Random(seed)
    rows = []
    next_id = 0
    for _ in range(n):
        base = rng.getrandbits(60)
        rows.append((next_id, base))
        if next_id % 10 == 0:
            rows.append((next_id + 100000, base ^ (1 << rng.randrange(60))))
            b1, b2, b3 = (rng.randrange(60) for _ in range(3))
            rows.append(
                (next_id + 200000, base ^ (1 << b1) ^ (1 << b2) ^ (1 << b3))
            )
        next_id += 1
    return rows


def _brute_pairs(rows, max_hamming):
    out = set()
    for (ia, pa), (ib, pb) in itertools.combinations(rows, 2):
        if ia > ib:
            ia, ib, pa, pb = ib, ia, pb, pa
        h = bin(pa ^ pb).count("1")
        if h <= max_hamming:
            out.add((ia, ib, h))
    return out


@pytest.mark.parametrize("max_hamming", [0, 2, 3])
def test_banded_equals_brute_force(spark, max_hamming):
    rows = _corpus(spark)
    df = spark.createDataFrame(rows, "doc_id long, phash long").repartition(7)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_neardup_pairs(df, max_hamming=max_hamming).collect()
    }
    assert got == _brute_pairs(rows, max_hamming)
    if max_hamming >= 2:
        assert got, "corpus must actually contain planted near-dup pairs"


def test_exactness_guard_rejects_wide_hamming():
    with pytest.raises(ValueError, match="exact"):
        phash_neardup_pairs(None, max_hamming=4, n_bands=4)


def test_band_freq_cutoff_drops_hot_bucket_pairs(spark):
    # 50 identical hashes (a constant-color thumbnail) + one honest pair at
    # Hamming 60 from the hot cluster (no shared band values with it)
    far = (1 << 60) - 1
    rows = [(i, 0) for i in range(50)] + [(100, far), (101, far ^ 2)]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    exact = phash_neardup_pairs(df, max_hamming=3)
    assert exact.count() == 50 * 49 // 2 + 1
    capped = phash_neardup_pairs(df, max_hamming=3, max_band_freq=10)
    # every band bucket of the hot hash exceeds the cutoff -> its O(k^2)
    # pairs vanish; the honest pair's buckets (size 2) survive
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(100, 101)}


def test_plan_has_no_cartesian_and_joins_on_band_key(spark):
    df = spark.createDataFrame([(1, 5), (2, 7)], "doc_id long, phash long")
    plan = phash_neardup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phash_screen_flags_near_dups(spark):
    from etherscan_contract_crawler_spark.analytics.phash import phash_screen

    corpus = spark.createDataFrame(
        [(100, 0b1111000011110000), (101, 1 << 40)], ["image_id", "phash"]
    )
    batch = spark.createDataFrame(
        [
            (1, 0b1111000011110001),          # hamming 1 from corpus 100 -> dup
            (2, (1 << 40) | 0b111),           # hamming 3 from corpus 101 -> dup
            (3, 0b1010101010101010101010101), # far from everything -> new
        ],
        ["image_id", "phash"],
    )
    out = {r["image_id"]: r["is_new"] for r in phash_screen(batch, corpus).collect()}
    assert out == {1: False, 2: False, 3: True}


def test_phash_screen_exactness_guard(spark):
    import pytest

    from etherscan_contract_crawler_spark.analytics.phash import phash_screen

    df = spark.createDataFrame([(1, 0)], ["image_id", "phash"])
    with pytest.raises(ValueError):
        phash_screen(df, df, max_hamming=4, n_bands=4)
