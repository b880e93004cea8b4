"""Streaming monitor: discovery semantics, stateful dedup, restart resume."""

import os

from etherscan_contract_crawler_spark.streaming.monitor import (
    BLOCKS_DDL,
    discovered_to_frontier,
    monitor_transform,
    run_monitor_stream,
)


def _blocks(spark, rows):
    return spark.createDataFrame(rows, BLOCKS_DDL)


ROWS_A = [
    # creation tx (to is null) — emitted even without code_present (B7)
    (1, "0xt1", None, "0xAAA1", False),
    # call tx to a contract — emitted lowercased
    (1, "0xt2", "0xBBB2", None, True),
    # call tx to an EOA (no code) — dropped
    (1, "0xt3", "0xCCC3", None, False),
    # duplicate call address — deduped by streaming state
    (2, "0xt4", "0xBBB2", None, True),
]


def test_monitor_transform_semantics(spark):
    out = monitor_transform(_blocks(spark, ROWS_A)).collect()
    addrs = sorted(r.address for r in out)
    assert addrs == ["0xaaa1", "0xbbb2", "0xbbb2"]  # batch transform: no dedup


def test_monitor_stream_dedup_and_resume(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _blocks(spark, ROWS_A).coalesce(1).write.mode("append").parquet(in_dir)
    q = run_monitor_stream(spark, in_dir, ckpt, out_dir)
    q.awaitTermination(120)
    got = {r.address for r in spark.read.parquet(out_dir).collect()}
    assert got == {"0xaaa1", "0xbbb2"}

    # restart with new data: previously-seen address must stay deduped
    more = [
        (3, "0xt5", "0xBBB2", None, True),  # dup across restart
        (3, "0xt6", "0xDDD4", None, True),  # new
    ]
    _blocks(spark, more).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = run_monitor_stream(spark, in_dir, ckpt, out_dir)
    q2.awaitTermination(120)
    got2 = sorted(r.address for r in spark.read.parquet(out_dir).collect())
    assert got2 == ["0xaaa1", "0xbbb2", "0xddd4"]


def test_discovered_to_frontier(spark):
    d = spark.createDataFrame(
        [(1, "0xt1", "0x" + "ab" * 20)], "block long, tx_hash string, address string"
    )
    f = discovered_to_frontier(d, n_buckets=8, epoch=3).collect()
    assert len(f) == 1
    assert f[0].domain == "rpc.internal"
    assert f[0].discovered_epoch == 3
    assert f[0].url_sha1 is not None and len(f[0].url_sha1) == 40
