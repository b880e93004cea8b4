"""Bounded-window range join without the range-explosion plan.

Crawl uses: correlate fetch attempts with rate-limit errors in the same
politeness window; join frontier discoveries to robots refreshes within a
TTL; any "rows of A near rows of B in time, per key" question. The naive
``a JOIN b ON a.k = b.k AND abs(a.ts - b.ts) <= w`` gives Catalyst only the
equi-key — every (key, ts-cluster) pair expands before the range predicate
filters, and a hot key degenerates toward its cross product.

The bucketed plan makes the time bound part of the JOIN KEY:

  1. bucket both sides by ``floor(ts / w)``;
  2. replicate the SMALLER side into its own bucket and both neighbors
     (3× one side only — never the big side);
  3. equi-join on (key, bucket) — any pair within ``w`` seconds shares a
     bucket with one of the three replicas (|ts_a - ts_b| <= w implies
     |bucket_a - bucket_b| <= 1);
  4. re-apply the exact range predicate to drop corner pairs.

Cost: one shuffle per side on (key, bucket) — the join key now bounds each
task's work to pairs at most 2 buckets apart, so a hot key's cost is
O(sum over adjacent buckets of |A_bucket| × |B_bucket|) instead of
O(|A_key| × |B_key|). Bucket width = the range bound: the replication
factor is a CONSTANT 3 regardless of data, and AQE's skew-join split
applies cleanly because the explosion is gone from the logical plan.

At 100 TB: both sides shuffle once; pick ``w`` = the real query bound (do
not widen it "for safety" — width only adds corner pairs the final filter
discards). If one side is dim-sized, skip all of this and broadcast it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    window_s: float,
    replicate: str = "right",
) -> DataFrame:
    """All (left, right) pairs with equal ``on`` keys and
    ``|left_ts - right_ts| <= window_s``. Column sets must be disjoint apart
    from ``on``. ``replicate``: which side is tripled ("right" by default —
    pass the smaller side there).
    """
    keys = [on] if isinstance(on, str) else list(on)
    w = float(window_s)
    lb = F.floor(F.col(left_ts).cast("double") / w)
    rb = F.floor(F.col(right_ts).cast("double") / w)

    if replicate == "right":
        r = right.withColumn("_bk", F.explode(F.array(rb - 1, rb, rb + 1)))
        l = left.withColumn("_bk", lb)
    else:
        l = left.withColumn("_bk", F.explode(F.array(lb - 1, lb, lb + 1)))
        r = right.withColumn("_bk", rb)

    pred = (
        F.abs(F.col(left_ts).cast("double") - F.col(right_ts).cast("double")) <= w
    )
    return l.join(r, on=keys + ["_bk"]).filter(pred).drop("_bk")
