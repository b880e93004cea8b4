"""J1/J2 — URL-seen dedup: bloom/cuckoo pre-filter + exact anti-join backstop.

Reference semantics: drop already-seen keys BEFORE any fetch —
``addresses.difference(ignored)`` (contract_crawler.py:466-468), dir-existence
probe (:378-379), monitor seen-check (blockchain-multichain-monitor.py:83-85).
That dedup-before-fetch ordering is the reference's one real optimization
(SURVEY.md §4 O1); Catalyst cannot reorder across the Python fetch barrier,
so this module constructs the plan in that order by hand.

Plan shape (scale rationale):
  candidates --(bloom/cuckoo probe, grouped by domain_hash)--> split
     bloom_maybe = False  -> DEFINITELY new (skips the join entirely; at a
                             ~1% duplicate+FP rate this removes ~99% of probe
                             traffic from the shuffle)
     bloom_maybe = True   -> exact left_anti join vs url_seen (sort-merge at
                             scale; both sides pre-bucketed by domain_hash so
                             AQE can plan a co-located join)
  union of the two = unseen frontier. Exact parity is guaranteed regardless
  of bloom FPR; a bloom false positive only costs one extra join probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .bloom import SegmentStore


def anti_join_seen(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """Exact J1: candidates not present in seen (key: url_sha1)."""
    return candidates.join(seen.select("url_sha1"), on="url_sha1", how="left_anti")


def unseen_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    store: SegmentStore | None,
    version: int | None,
) -> DataFrame:
    """Bloom/cuckoo-accelerated J1 (falls back to exact when no segments)."""
    if store is None or version is None or version not in store.versions():
        return anti_join_seen(candidates, seen)
    probed = store.probe(candidates, version)
    definitely_new = probed.filter(~probed.bloom_maybe).drop("bloom_maybe")
    maybe_seen = probed.filter(probed.bloom_maybe).drop("bloom_maybe")
    return definitely_new.unionByName(anti_join_seen(maybe_seen, seen))
