"""Streaming discovery → frontier → batch crawl: the full continuous loop
(custom DataSource chain → bounded dedup → frontier append → engine epoch)."""

import pytest

from etherscan_contract_crawler_spark.engine.crawl import CrawlEngine, EngineConfig
from etherscan_contract_crawler_spark.sources.blockstream import write_block_file
from etherscan_contract_crawler_spark.storage.icetable import SnapshotTable
from etherscan_contract_crawler_spark.streaming.continuous import (
    DISCOVERED_SEEN_DDL,
    run_discovery_to_frontier,
)


@pytest.mark.slow
def test_stream_discovery_feeds_crawl_epoch(spark, tmp_path):
    chain = str(tmp_path / "chain")
    addr = lambda i: "0x" + f"{i:040x}"  # noqa: E731
    write_block_file(
        chain, 0, "2024-01-01T12:00:00",
        [
            {"tx_hash": "0xt1", "to_addr": None, "created_contract": addr(1)},
            {"tx_hash": "0xt2", "to_addr": addr(2), "code_present": True},
            {"tx_hash": "0xt3", "to_addr": addr(3), "code_present": False},  # dropped
            {"tx_hash": "0xt4", "to_addr": addr(2), "code_present": True},  # dup
        ],
    )
    eng = CrawlEngine(
        spark,
        EngineConfig(warehouse=str(tmp_path / "wh"), n_buckets=8, epoch_duration_s=10),
    )
    eng.bootstrap(spark.createDataFrame([], "block long, tx_hash string, url string, priority double"))
    seen = SnapshotTable(str(tmp_path / "dseen"))
    seen.create(DISCOVERED_SEEN_DDL)

    q = run_discovery_to_frontier(
        spark, chain, str(tmp_path / "ckpt"), eng.frontier, seen, n_buckets=8, epoch=0
    )
    q.awaitTermination(180)
    assert eng.frontier.read(spark).count() == 2  # addr1 (creation) + addr2

    # the batch engine crawls exactly the discovered rows
    s = eng.run_epoch(0)
    assert s["scheduled"] == 2
    assert eng.url_seen.read(spark).count() == 2

    # chain grows with one re-discovery and one new address; restart drains
    # only the new block, long-tail dedup keeps addr2 out
    write_block_file(
        chain, 1, "2024-01-01T12:05:00",
        [
            {"tx_hash": "0xt5", "to_addr": addr(2), "code_present": True},
            {"tx_hash": "0xt6", "to_addr": addr(9), "code_present": True},
        ],
    )
    q2 = run_discovery_to_frontier(
        spark, chain, str(tmp_path / "ckpt"), eng.frontier, seen, n_buckets=8, epoch=1
    )
    q2.awaitTermination(180)
    s1 = eng.run_epoch(1)
    assert s1["scheduled"] == 1  # only addr9 is new
    assert eng.url_seen.read(spark).count() == 3
