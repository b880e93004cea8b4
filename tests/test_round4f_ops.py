"""Round-4 batch 3: seed hop distance (BFS layers), watermark lateness
audit, watermark/overlay band gate — semantics the oracles can't pin
alone (min-hop over multiple paths, unreached absence, exact nearest-rank
p99 at tiny n, the zero-body-energy branch, partition invariance)."""

import numpy as np
from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.graph import seed_hop_distance
from etherscan_contract_crawler_spark.functions.images import (
    decode_image,
    encode_png,
)
from etherscan_contract_crawler_spark.operators.validate import (
    watermark_band_gate,
)
from etherscan_contract_crawler_spark.sources.synthetic import payload_for_key
from etherscan_contract_crawler_spark.streaming.lateness import (
    watermark_lateness_audit,
)


# --------------------------------------------------------- seed_hop_distance
def test_seed_hop_distance_takes_min_over_paths(spark):
    # 0 -> 1 -> 2 -> 3 and a shortcut 0 -> 2: node 2 is 1 hop, not 2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    out = {r["id"]: r["hops"] for r in seed_hop_distance(edges, seeds, 3).collect()}
    assert out == {0: 0, 1: 1, 2: 1, 3: 2}


def test_seed_hop_distance_unreached_nodes_absent(spark):
    edges = spark.createDataFrame([(0, 1), (5, 6)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["id"])
    out = {r["id"]: r["hops"] for r in seed_hop_distance(edges, seeds, 3).collect()}
    assert 5 not in out and 6 not in out
    assert out == {0: 0, 1: 1}


def test_seed_hop_distance_bounded_by_max_hops(spark):
    # chain 0->1->2->3->4 with max_hops=2 stops at node 2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    out = {r["id"]: r["hops"] for r in seed_hop_distance(edges, seeds, 2).collect()}
    assert out == {0: 0, 1: 1, 2: 2}


# ---------------------------------------------------- watermark_lateness_audit
def _stream(spark, rows):
    df = spark.createDataFrame(rows, ["part", "ts_s", "arrival_id"])
    return df.select(
        "part", F.timestamp_seconds("ts_s").alias("ts"), "arrival_id"
    )


def test_lateness_measured_against_running_high_water(spark):
    # arrival order: t=100, t=50 (late by 50), t=200, t=90 (late by 110)
    rows = [(0, 100, 1), (0, 50, 2), (0, 200, 3), (0, 90, 4)]
    out = watermark_lateness_audit(
        _stream(spark, rows), watermark_s=60
    ).collect()[0]
    assert out["n_events"] == 4
    assert out["n_late"] == 1  # only the 110-s event exceeds W=60
    assert out["max_late_s"] == 110


def test_lateness_p99_is_nearest_rank_max_at_tiny_n(spark):
    # n=4: ceil(4*0.99)=4 -> p99 is the maximum lateness
    rows = [(0, 100, 1), (0, 50, 2), (0, 200, 3), (0, 90, 4)]
    out = watermark_lateness_audit(_stream(spark, rows), 60).collect()[0]
    assert out["p99_late_s"] == out["max_late_s"] == 110


def test_lateness_partitions_independent(spark):
    # part 1's later clock never makes part 0's events late
    rows = [(0, 100, 1), (1, 10_000, 2), (0, 100, 3)]
    out = {r["part"]: r for r in watermark_lateness_audit(_stream(spark, rows), 0).collect()}
    assert out[0]["max_late_s"] == 0 and out[1]["max_late_s"] == 0


# ------------------------------------------------------- watermark_band_gate
def _img_df(spark, pairs):
    return spark.createDataFrame(pairs, ["image_id", "bytes"])


def test_watermark_band_gate_flags_stamped_band_not_clean(spark):
    p = payload_for_key("cafe01")
    clean = p["bytes"]
    px = decode_image(clean).copy()
    h = px.shape[0]
    band = px[h - max(h // 5, 1):]
    band[:, ::2] = 0
    band[:, 1::2] = 255
    stamped = encode_png(px)
    out = {
        r["image_id"]: r
        for r in watermark_band_gate(
            _img_df(spark, [("clean", bytearray(clean)), ("marked", bytearray(stamped))])
        ).collect()
    }
    assert out["clean"]["watermarked"] is False and out["clean"]["keep"] is True
    assert out["marked"]["watermarked"] is True and out["marked"]["keep"] is False
    assert out["marked"]["band_energy_q"] > 3 * out["marked"]["body_energy_q"]


def test_watermark_band_gate_zero_body_energy_branch(spark):
    # flat body, striped band: body energy exactly 0 -> still flagged
    px = np.full((20, 20, 3), 128, dtype=np.uint8)
    px[16:, ::2] = 0
    px[16:, 1::2] = 255
    out = watermark_band_gate(
        _img_df(spark, [("flatband", bytearray(encode_png(px)))])
    ).collect()[0]
    assert out["body_energy_q"] == 0
    assert out["watermarked"] is True


def test_watermark_band_gate_error_to_null(spark):
    out = watermark_band_gate(
        _img_df(spark, [("bad", bytearray(b"notanimage"))])
    ).collect()[0]
    assert out["band_energy_q"] is None and out["watermarked"] is None
    assert out["keep"] is False


def test_watermark_band_gate_partition_invariant(spark):
    p = payload_for_key("cafe02")
    df = _img_df(spark, [(f"i{i}", bytearray(p["bytes"])) for i in range(8)])
    a = sorted(map(tuple, watermark_band_gate(df.repartition(1)).collect()))
    b = sorted(map(tuple, watermark_band_gate(df.repartition(7)).collect()))
    assert a == b
