"""The continuous face, end to end: chain the monitor's discovery loop into
the crawl frontier (SURVEY.md §3.3's frontier-expansion loop, composed from
the round-2 streaming pieces).

    blockstream DataSource (sources/blockstream.py — offset cursor, replay)
        │ readStream
        ▼
    monitor_transform (creation/call split, B7 mark semantics)
        │ withWatermark + dropDuplicatesWithinWatermark   (hot-tier dedup,
        ▼                                                  state = window-bounded)
    foreachBatch:
        anti-join durable seen table (long-tail dedup, restart-proof)
        stateful token-bucket gate? — admission happens in the BATCH engine's
            politeness windows once rows are frontier-resident; the streaming
            ratelimit operator (streaming/ratelimit.py) is for pipelines that
            fetch straight off the stream
        seeds_to_frontier projection → frontier SnapshotTable append
        seen-table merge (mark-at-schedule, like the reference :85-86)

The crawl engine then schedules these rows in its next epoch — streaming
discovery and batch fetching share one frontier, which is exactly the
reference's monitor→crawler handoff (CSV file there, Iceberg-semantics
table here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storage.icetable import SnapshotTable
from .monitor import monitor_transform

DISCOVERED_SEEN_DDL = "address string"


def run_discovery_to_frontier(
    spark: SparkSession,
    chain_dir: str,
    checkpoint_dir: str,
    frontier: SnapshotTable,
    seen: SnapshotTable,
    n_buckets: int,
    epoch: int,
    watermark_delay: str = "10 minutes",
    domain: str = "rpc.internal",
    use_datasource: bool = True,
):
    """Drain the chain into the frontier once (availableNow; production uses
    a processingTime trigger). Returns the streaming query.

    Exactly-once end to end: the source replays by block offset, the
    watermarked state dedups the hot window, the seen-table anti-join
    dedups the long tail, and the frontier append is keyed — a micro-batch
    that crashes mid-foreachBatch re-runs against the same seen state.
    """
    from ..sources.seeds import seeds_to_frontier

    if use_datasource:
        from ..sources.blockstream import BlockStreamDataSource

        spark.dataSource.register(BlockStreamDataSource)
        stream = spark.readStream.format("blockstream").option("path", chain_dir).load()
    else:
        from ..sources.blockstream import BLOCKS_DDL

        stream = spark.readStream.schema(BLOCKS_DDL).parquet(chain_dir)

    discovered = (
        monitor_transform(stream)
        .withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["address"])
    )

    def land(batch: DataFrame, batch_id: int) -> None:
        fresh = (
            batch.dropDuplicates(["address"])
            .join(seen.read(batch.sparkSession).select("address"), "address", "left_anti")
            .cache()
        )
        seeds = fresh.select(
            "block",
            "tx_hash",
            F.concat(
                F.lit(f"https://{domain}/address/"), F.col("address"), F.lit("#code")
            ).alias("url"),
            F.lit(0.5).alias("priority"),
        )
        rows, _ = seeds_to_frontier(seeds, n_buckets=n_buckets, epoch=epoch)
        frontier.append(rows.dropDuplicates(["url_sha1"]))
        # mark-at-schedule (reference :85-86): seen even before any fetch
        seen.merge_not_matched(fresh.select("address"), ["address"])
        fresh.unpersist()

    return (
        discovered.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
