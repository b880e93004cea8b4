"""T1-T5 — the blockchain monitor re-expressed on Structured Streaming.

Reference (blockchain-multichain-monitor.py): an unbounded poll loop over new
blocks (:97-102), per-tx split into contract-creation vs call branches (:76),
an in-memory seen set updated at *schedule* time (:83-86 — even when the
later is_contract check fails, quirk SURVEY.md §8 B7), and a CSV append sink
bootstrapped back into state on restart (:60-66).

Spark-first mapping:
  * block stream -> ``readStream`` through the custom Python DataSource
    (``sources/blockstream.py`` — ``simpleStreamReader`` over the simulated
    chain; JSON-RPC in production) or a plain file source;
  * block -> tx expansion -> ``explode`` (S8);
  * creation/call branch -> ``when(to_addr.isNull(), ...)`` (P2);
  * is_contract RPC -> the ``code_present`` column (batched lookup done by
    the fetch layer in production — P3);
  * seen set -> BOUNDED, two tiers (r1 VERDICT #5): the hot tier is
    ``dropDuplicatesWithinWatermark`` state (sized by the watermark delay,
    NOT by total history — plain ``dropDuplicates`` grows forever); the long
    tail is the durable seen table probed per micro-batch in ``foreachBatch``
    (stream-static left_anti — the same exact-join backstop the batch engine
    uses, bloom-prefilterable at scale);
  * CSV append -> ``foreachBatch`` append into the frontier SnapshotTable,
    which feeds the next crawl epoch (the frontier-expansion loop, §3.3).

The core engine stays epoch-batch (deterministic + resumable, matching the
reference's poll loop); this module is the continuous face over the same
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.blockstream import BLOCKS_DDL  # noqa: F401  (re-export, one schema)

DISCOVERED_DDL = "block long, ts timestamp, tx_hash string, address string"


def monitor_transform(txs: DataFrame) -> DataFrame:
    """Per-tx discovery semantics (blockchain-multichain-monitor.py:75-88).

    Creation branch: emit the created contract address unconditionally (the
    reference never dedups creations, §8 B7). Call branch: emit ``to_addr``
    when code is present. Both lowercased (F2).
    """
    creation = txs.filter(F.col("to_addr").isNull()).select(
        "block", "ts", "tx_hash", F.lower(F.col("created_contract")).alias("address")
    )
    call = (
        txs.filter(F.col("to_addr").isNotNull() & F.col("code_present"))
        .select("block", "ts", "tx_hash", F.lower(F.col("to_addr")).alias("address"))
    )
    return creation.unionByName(call).filter(F.col("address").isNotNull())


def run_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    dedup_calls: bool = True,
    watermark_delay: str = "10 minutes",
    seen_table=None,
    use_datasource: bool = False,
):
    """Streaming monitor: watch the chain for new blocks, emit newly
    discovered addresses to ``output_dir``.

    State is bounded: ``withWatermark(ts) + dropDuplicatesWithinWatermark``
    keeps only addresses younger than the watermark in state (the streaming
    analog the survey names for T2, SURVEY.md §2.8), so state size tracks the
    recent-duplicate window, not total history. When ``seen_table`` (a
    SnapshotTable) is given, each micro-batch also anti-joins it and merges
    its own output back — the durable long-tail dedup that survives both
    restarts and watermark expiry, mark-at-schedule like the reference (B7).

    ``use_datasource=True`` reads through the custom Python DataSource
    (production shape); otherwise a parquet file stream (fixture shape).
    Uses availableNow in tests (drain-and-stop); processingTime in production.
    """
    if use_datasource:
        from ..sources.blockstream import BlockStreamDataSource

        spark.dataSource.register(BlockStreamDataSource)
        stream = (
            spark.readStream.format("blockstream").option("path", input_dir).load()
        )
    else:
        stream = spark.readStream.schema(BLOCKS_DDL).parquet(input_dir)
    discovered = monitor_transform(stream)
    if dedup_calls:
        discovered = discovered.withWatermark(
            "ts", watermark_delay
        ).dropDuplicatesWithinWatermark(["address"])

    if seen_table is None:
        return (
            discovered.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    def land_batch(batch: DataFrame, batch_id: int) -> None:
        # long-tail dedup: exact anti-join vs the durable seen set (the
        # bloom-prefilterable backstop at scale), then mark-at-schedule
        batch = batch.dropDuplicates(["address"])  # within-batch
        fresh = batch.join(
            seen_table.read(batch.sparkSession).select("address"),
            "address",
            "left_anti",
        ).cache()
        fresh.write.mode("append").parquet(output_dir)
        seen_table.merge_not_matched(fresh.select("address"), ["address"])
        fresh.unpersist()

    return (
        discovered.writeStream.foreachBatch(land_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def discovered_to_frontier(
    discovered: DataFrame, n_buckets: int, epoch: int, domain: str = "rpc.internal"
) -> DataFrame:
    """Project discovered addresses into frontier rows (next epoch's seeds)."""
    from ..sources.seeds import seeds_to_frontier

    seeds = discovered.select(
        "block",
        "tx_hash",
        F.concat(F.lit(f"https://{domain}/address/"), F.col("address"), F.lit("#code")).alias(
            "url"
        ),
        F.lit(0.5).alias("priority"),
    )
    frontier, _ = seeds_to_frontier(seeds, n_buckets=n_buckets, epoch=epoch)
    return frontier
