"""Redirect-chain resolution — follow 301 maps to their terminal URL.

A crawler that lands redirects must canonicalize the frontier onto
terminal URLs or it re-fetches every hop forever (the reference lets the
requests library chase redirects per call — contract_crawler.py's
session.get — which at frontier scale re-walks shared chains once per
referrer). Here the redirect map is resolved ONCE, set-at-a-time.

The map is a functional graph (one out-edge per src), so resolution is
pointer DOUBLING: each round composes the map with itself, reaching
2^k hops after k self-joins — a 16-hop budget costs 4 joins, not 16.
Every join is src↔dst equi-keyed: at 10^10 URLs the map is
hash-partitioned by src and each round is one co-partitioned shuffle of
the still-unresolved remainder (resolved rows stop composing). Rows that
never reach a terminal inside the hop budget (cycles, over-long chains)
come back resolved=false with NULL terminal — the caller's dead-letter.

Each round is localCheckpoint-ed so plan lineage stays O(1), the same
guard neardup_components uses for iterative DataFrame algorithms.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, max_hops: int = 16) -> DataFrame:
    """Resolve each src to its terminal target within ``max_hops``.

    edges: (src, dst) with ONE out-edge per src (a redirect map).
    A node is terminal when it has no out-edge in the map.
    Returns (src, terminal_id, n_hops, resolved) — terminal_id/n_hops
    NULL when the chain doesn't terminate within the budget.
    """
    cur = edges.select(
        "src", "dst", F.lit(1).alias("hops"), F.lit(False).alias("done")
    )
    rounds = max(1, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        b = cur.select(
            F.col("src").alias("b_src"),
            F.col("dst").alias("b_dst"),
            F.col("hops").alias("b_hops"),
            F.col("done").alias("b_done"),
        )
        stop = F.col("done") | F.col("b_src").isNull()
        cur = (
            cur.join(b, cur["dst"] == b["b_src"], "left")
            .select(
                "src",
                F.when(stop, F.col("dst")).otherwise(F.col("b_dst")).alias("dst"),
                F.when(stop, F.col("hops"))
                .otherwise(F.col("hops") + F.col("b_hops"))
                .alias("hops"),
                (stop | F.col("b_done")).alias("done"),
            )
            .localCheckpoint(eager=False)
        )
    # the done flag lags a round: a walk landing on a terminal at exactly
    # 2^rounds hops has not yet LOOKED UP that node and seen it has no
    # out-edge. One final membership probe against the (distinct-src) key
    # set settles it without paying a whole extra composition round.
    keys = edges.select(F.col("src").alias("k_src")).distinct()
    cur = cur.join(keys, cur["dst"] == keys["k_src"], "left")
    resolved = F.col("done") | F.col("k_src").isNull()
    return cur.select(
        "src",
        F.when(resolved, F.col("dst")).alias("terminal_id"),
        F.when(resolved, F.col("hops")).cast("int").alias("n_hops"),
        resolved.alias("resolved"),
    )
