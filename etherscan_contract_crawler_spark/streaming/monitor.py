"""T1-T5 — the blockchain monitor re-expressed on Structured Streaming.

Reference (blockchain-multichain-monitor.py): an unbounded poll loop over new
blocks (:97-102), per-tx split into contract-creation vs call branches (:76),
an in-memory seen set updated at *schedule* time (:83-86 — even when the
later is_contract check fails, quirk SURVEY.md §8 B7), and a CSV append sink
bootstrapped back into state on restart (:60-66).

Spark-first mapping:
  * block stream -> ``readStream`` (file source in the sandbox; a custom
    python DataSource ``simpleStreamReader`` over JSON-RPC in production);
  * block -> tx expansion -> ``explode`` (S8);
  * creation/call branch -> ``when(to_addr.isNull(), ...)`` (P2);
  * is_contract RPC -> the ``code_present`` column (batched lookup done by
    the fetch layer in production — P3);
  * seen set -> ``dropDuplicates(["address"])`` streaming state; restart
    bootstrap comes free from the checkpoint (T3);
  * CSV append -> ``foreachBatch`` append into the frontier SnapshotTable,
    which feeds the next crawl epoch (the frontier-expansion loop, §3.3).

The core engine stays epoch-batch (deterministic + resumable, matching the
reference's poll loop); this module is the continuous face over the same
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOCKS_DDL = (
    "block long, tx_hash string, to_addr string, created_contract string, "
    "code_present boolean"
)

DISCOVERED_DDL = "block long, tx_hash string, address string"


def monitor_transform(txs: DataFrame) -> DataFrame:
    """Per-tx discovery semantics (blockchain-multichain-monitor.py:75-88).

    Creation branch: emit the created contract address unconditionally (the
    reference never dedups creations, §8 B7). Call branch: emit ``to_addr``
    when code is present. Both lowercased (F2).
    """
    creation = txs.filter(F.col("to_addr").isNull()).select(
        "block", "tx_hash", F.lower(F.col("created_contract")).alias("address")
    )
    call = (
        txs.filter(F.col("to_addr").isNotNull() & F.col("code_present"))
        .select("block", "tx_hash", F.lower(F.col("to_addr")).alias("address"))
    )
    return creation.unionByName(call).filter(F.col("address").isNotNull())


def run_monitor_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    dedup_calls: bool = True,
):
    """File-source streaming monitor: watch ``input_dir`` for block-batch
    parquet files, emit discovered addresses to ``output_dir``.

    Uses availableNow in tests (drain-and-stop); processingTime in production.
    ``dropDuplicates(["address"])`` holds the seen-set as streaming state and
    restores it from the checkpoint on restart (T3).
    """
    stream = spark.readStream.schema(BLOCKS_DDL).parquet(input_dir)
    discovered = monitor_transform(stream)
    if dedup_calls:
        discovered = discovered.dropDuplicates(["address"])
    return (
        discovered.writeStream.format("parquet")
        .option("path", output_dir)
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
