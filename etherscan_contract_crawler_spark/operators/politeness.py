"""W1/W2 — priority ordering + per-domain politeness windows, skew-guarded.

Reference semantics re-expressed:
  * crawl ordering — the reference iterates pages 1..20 then rows
    (contract_crawler.py:316-325) and, on the CSV path, a hash-ordered Python
    set (:468-471, nondeterministic — SURVEY.md §8 B4). The engine pins the
    canonical order (priority DESC, next_fetch_time ASC, url_sha1 ASC).
  * politeness — the intended-but-dead rate limiter ``@limits(calls=5,
    period=1)`` (contract_crawler.py:372-375, §8 B1) becomes a *data* plan:
    per-domain row_number -> fetch_slot -> scheduled offset. No wall-clock
    sleeps in the plan; the fetcher honors the offsets.

Skew: a hot domain makes ``Window.partitionBy(domain)`` a single giant
partition. ``schedule_epoch`` first pre-ranks within (domain, salt) and keeps
only rows that can possibly be admitted (local rank <= capacity) — global
rank <= capacity implies per-salt rank <= capacity, so this is lossless —
then runs the exact window on the survivors, whose per-domain size is bounded
by n_salts * capacity regardless of input skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: reference's intended budget: 5 calls / 1 s (contract_crawler.py:373)
DEFAULT_MAX_CALLS = 5
DEFAULT_PERIOD_S = 1

def canonical_order() -> list:
    """The engine's pinned crawl order (SURVEY.md §8 B4)."""
    return [
        F.col("priority").desc(),
        F.col("next_fetch_time").asc(),
        F.col("url_sha1").asc(),
    ]


def with_budget(pending: DataFrame, budgets: DataFrame | None) -> DataFrame:
    """Broadcast-join the per-domain budget dim (FIXTURES.md §5); defaults to
    the reference's intended 5 calls / 1 s."""
    if budgets is None:
        return pending.withColumn("max_calls", F.lit(DEFAULT_MAX_CALLS)).withColumn(
            "period_s", F.lit(DEFAULT_PERIOD_S)
        )
    return pending.join(F.broadcast(budgets), on="domain", how="left").fillna(
        {"max_calls": DEFAULT_MAX_CALLS, "period_s": DEFAULT_PERIOD_S}
    )


def robots_filter(pending: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop URLs disallowed by the robots cache dim.

    ``robots`` schema: domain string, disallow array<string> (path prefixes).
    Broadcast hash join + higher-order ``exists`` — no UDF.
    """
    if robots is None:
        return pending
    path = F.parse_url(F.col("url_canon"), F.lit("PATH"))
    joined = pending.join(F.broadcast(robots), on="domain", how="left")
    blocked = F.when(
        F.col("disallow").isNull(), F.lit(False)
    ).otherwise(F.exists(F.col("disallow"), lambda p: path.startswith(p)))
    return joined.filter(~blocked).drop("disallow")


def schedule_epoch(
    pending: DataFrame,
    budgets: DataFrame | None = None,
    robots: DataFrame | None = None,
    epoch_duration_s: int = 60,
    batch_size: int | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """Produce the ordered, admitted fetch batch for one epoch.

    Output adds: rn (per-domain rank), fetch_slot, scheduled_offset_s.
    Admission: rn <= max_calls * floor(epoch_duration_s / period_s).
    Global cap: top-``batch_size`` in canonical order (TakeOrdered — no full
    sort materialized).
    """
    pending = robots_filter(pending, robots)
    pending = with_budget(pending, budgets)
    capacity = (F.col("max_calls") * F.floor(F.lit(epoch_duration_s) / F.col("period_s"))).cast(
        "int"
    )
    pending = pending.withColumn("capacity", capacity)

    # --- phase 1: salted pre-rank (skew guard, lossless) ---
    salted = pending.withColumn("_salt", F.pmod(F.xxhash64("url_sha1"), F.lit(n_salts)))
    w_local = Window.partitionBy("domain", "_salt").orderBy(*canonical_order())
    survivors = (
        salted.withColumn("_local_rn", F.row_number().over(w_local))
        .filter(F.col("_local_rn") <= F.col("capacity"))
        .drop("_salt", "_local_rn")
    )

    # --- phase 2: exact per-domain rank on the bounded survivor set ---
    w = Window.partitionBy("domain").orderBy(*canonical_order())
    admitted = (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("capacity"))
        .withColumn("fetch_slot", ((F.col("rn") - 1) / F.col("max_calls")).cast("int"))
        .withColumn(
            "scheduled_offset_s", (F.col("fetch_slot") * F.col("period_s")).cast("double")
        )
        .drop("capacity")
    )
    if batch_size is not None:
        admitted = admitted.orderBy(*canonical_order()).limit(batch_size)
    return admitted
