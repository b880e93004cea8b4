"""Bloom/cuckoo segment store: no false negatives; probe split correctness."""

import numpy as np
import pandas as pd
import pytest

from etherscan_contract_crawler_spark.operators.bloom import SegmentStore, _CuckooTable, _h1h2
from etherscan_contract_crawler_spark.oracle.reference_oracle import sha1_py


def _keys(n, salt=""):
    return [sha1_py(f"k{i}{salt}") for i in range(n)]


def test_cuckoo_no_false_negatives():
    keys = pd.Series(_keys(3000))
    h1, h2 = _h1h2(keys)
    ck = _CuckooTable.build(h1, h2)
    if not ck.saturated:
        assert ck.contains(h1, h2).all()


def test_cuckoo_low_false_positive_rate():
    ins = pd.Series(_keys(2000))
    probe = pd.Series(_keys(2000, salt="x"))
    ck = _CuckooTable.build(*_h1h2(ins))
    if ck.saturated:
        pytest.skip("saturated table degrades to bloom-only")
    fpr = ck.contains(*_h1h2(probe)).mean()
    assert fpr < 0.05


def test_segment_store_no_false_negatives(spark, tmp_path):
    n_buckets = 8
    seen_rows = [(k, int(k[:4], 16) % n_buckets) for k in _keys(2000)]
    seen = spark.createDataFrame(seen_rows, "url_sha1 string, domain_hash int")
    store = SegmentStore(str(tmp_path / "segs"), n_buckets)
    built = store.build(seen, version=1)
    assert sum(built.values()) == 2000
    probed = store.probe(seen, version=1)
    # every inserted key must come back maybe=True
    assert probed.filter(~probed.bloom_maybe).count() == 0


def test_segment_store_definitely_new_is_correct(spark, tmp_path):
    n_buckets = 8
    seen = spark.createDataFrame(
        [(k, int(k[:4], 16) % n_buckets) for k in _keys(1000)],
        "url_sha1 string, domain_hash int",
    )
    store = SegmentStore(str(tmp_path / "segs"), n_buckets)
    store.build(seen, version=1)
    fresh = spark.createDataFrame(
        [(k, int(k[:4], 16) % n_buckets) for k in _keys(1000, salt="y")],
        "url_sha1 string, domain_hash int",
    )
    probed = store.probe(fresh, version=1).toPandas()
    # most fresh keys skip the join; any that don't are just extra probes
    assert (~probed.bloom_maybe).mean() > 0.95


def test_probe_without_segment_marks_all_new(spark, tmp_path):
    store = SegmentStore(str(tmp_path / "segs"), 4)
    seen = spark.createDataFrame([("a" * 40, 0)], "url_sha1 string, domain_hash int")
    store.build(seen, version=1)
    other_bucket = spark.createDataFrame(
        [(sha1_py("z"), 3)], "url_sha1 string, domain_hash int"
    )
    probed = store.probe(other_bucket, version=1).collect()
    assert probed[0].bloom_maybe is False


def test_bloom_fpr_measured(spark, tmp_path):
    """FIXTURES.md §8 'small' purpose: measured FPR sanity (bits_per_key=12,
    k=7 -> theoretical ~0.3%)."""
    n_buckets = 4
    store = SegmentStore(str(tmp_path / "segs"), n_buckets, bits_per_key=12)
    seen = spark.createDataFrame(
        [(k, int(k[:4], 16) % n_buckets) for k in _keys(5000)],
        "url_sha1 string, domain_hash int",
    )
    store.build(seen, version=1)
    probe = spark.createDataFrame(
        [(k, int(k[:4], 16) % n_buckets) for k in _keys(5000, salt="q")],
        "url_sha1 string, domain_hash int",
    )
    fpr = store.probe(probe, version=1).toPandas().bloom_maybe.mean()
    assert fpr < 0.02
