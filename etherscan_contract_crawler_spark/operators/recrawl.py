"""Freshness-driven re-crawl scheduling — change-rate → next-fetch interval.

The reference crawls each address exactly once and skips it forever after
(the ``checkpoint``/seen set, contract_crawler.py:345-358): correct for
immutable contract source, wrong for the general web, where a frontier must
decide WHEN to fetch a URL again. The standard estimator (Cho &
Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers", TODS
2003) drives the interval from the observed change rate: pages that changed
on most past visits are re-fetched hot, static pages decay to a slow lane.

This module computes it from the fetch-history log in one pass:
  * per URL, order observations by ``(ts, obs_id)`` (the id tie-break makes
    the LAG deterministic) and count transitions where the content
    fingerprint differs from the previous visit — ONE window shuffle on
    ``url_id``, which at 100 TB is the same hash-partitioning the frontier
    already uses (``domain_hash``), so in the epoch pipeline this exchange
    co-locates with the scheduler's.
  * ``change_rate = n_changes / (n_obs - 1)`` over ≥2 observations;
    single-visit URLs fall in the default lane.
  * lane thresholds are integer-safe (``2*n_changes >= n_obs-1`` etc.) so an
    independent SQL oracle reproduces them without float-boundary risk.

Output ``(url_id, n_obs, n_changes, lane)`` feeds the scheduler's priority
column directly: ``lane`` is an ordinal the politeness window can multiply
into ``next_fetch_time``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: lane -> re-fetch interval multiplier (ordinal; the scheduler maps lanes
#: to concrete intervals). 0 = hottest.
LANES = ("hourly", "daily", "weekly")


def recrawl_lanes(
    history: DataFrame,
    url_col: str = "url_id",
    ts_col: str = "ts",
    obs_col: str = "obs_id",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Assign each URL a re-crawl lane from its observed change history.

    ``history`` carries one row per past fetch: the URL key, the fetch
    timestamp, a unique observation id (tie-break), and a content
    fingerprint (checksum column from the landing table).
    """
    w = Window.partitionBy(url_col).orderBy(ts_col, obs_col)
    prev = F.lag(fingerprint_col).over(w)
    changed = (
        prev.isNotNull() & (F.col(fingerprint_col) != prev)
    ).cast("long")
    per_url = (
        history.select(
            F.col(url_col).alias("url_id"),
            changed.alias("changed"),
        )
        .groupBy("url_id")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum("changed").alias("n_changes"),
        )
    )
    n_intervals = F.col("n_obs") - 1
    lane = (
        F.when(n_intervals <= 0, F.lit("daily"))  # single visit: default lane
        .when(F.col("n_changes") * 2 >= n_intervals, F.lit("hourly"))
        .when(F.col("n_changes") * 10 >= n_intervals, F.lit("daily"))
        .otherwise(F.lit("weekly"))
    )
    return per_url.select("url_id", "n_obs", "n_changes", lane.alias("lane"))


def cdx_revisits(
    captures: DataFrame,
    key_col: str = "urlkey",
    ts_col: str = "ts",
    digest_col: str = "digest",
    obs_col: str | None = None,
) -> DataFrame:
    """CDX-style revisit deduplication — the storage-side twin of
    recrawl_lanes: a capture whose payload digest equals the PREVIOUS
    capture of the same URL is stored as a ``revisit`` record (a pointer to
    the prior payload), not a second payload — the rule web archives
    (WARC `revisit` records, CDX `warc/revisit`) use to keep re-crawls of
    unchanged pages nearly free.

    Output one row per capture: (urlkey, ts, digest, is_revisit,
    payload_seq) — payload_seq numbers the distinct stored payloads per
    URL (revisits reference payload_seq of the capture they point at,
    which is their own value here since runs share it).

    Plan shape: ONE exchange on urlkey + a per-URL window (lag + running
    sum over the same sort) — Spark fuses both into a single Window node,
    so the capture log is shuffled exactly once no matter how long the
    history; per-URL history length bounds the window buffer, never the
    corpus.

    ``obs_col`` (a unique observation id, same convention as
    recrawl_lanes) breaks same-timestamp ties so the lag order — and
    therefore which capture of a tied pair reads as "the revisit" — is
    total under any partitioning; omit it only when ``ts_col`` is unique
    per URL (the entry-query synth guarantees that).
    """
    order = [ts_col] if obs_col is None else [ts_col, obs_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(digest_col).over(w)
    is_new = prev.isNull() | (F.col(digest_col) != prev)
    return captures.select(
        F.col(key_col).alias("urlkey"),
        F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
        (~is_new).alias("is_revisit"),
        F.sum(is_new.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("payload_seq"),
    )


def recrawl_interval_estimate(
    captures: DataFrame,
    key_col: str = "url_key",
    ts_col: str = "ts",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Estimate per-URL change rate from capture history → revisit interval.

    The continuous companion of ``recrawl_lanes`` (above): lanes bucket
    URLs into ordinal speed classes for the scheduler's cheap path; this
    emits the quantitative interval — expected time between changes,
    ``span DIV max(changes, 1)`` — plus the observed cadence
    (``avg_gap_s``), which the politeness window multiplies directly into
    ``next_fetch_time`` when per-URL precision is worth the extra column.
    A page never seen changing gets the full observed span: crawl it no
    more often than we've watched it.

    Integer end to end: epoch-second timestamps, floor division — the
    DuckDB oracle reproduces every value bit-exactly, no float tolerance.

    Returns (url_key, n_obs, n_changes, avg_gap_s, recrawl_s); URLs with a
    single capture are dropped (no interval to learn from).

    Scale notes: ONE exchange on url_key feeds both the lag window and the
    aggregate (same partitioning — Catalyst plans window + partial agg
    without a second shuffle). Output is URL-cardinality, n_obs-independent
    state per key: this runs over a 10^10-capture CDX listing as a single
    window + agg pass.
    """
    base = captures.select(
        F.col(key_col).alias("url_key"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ts"),
        F.col(fp_col).alias("_fp"),
    )
    w = Window.partitionBy("url_key").orderBy("_ts", "_fp")
    changed = (
        F.col("_fp") != F.lag("_fp", 1).over(w)
    ).cast("long")  # first row: lag NULL -> comparison NULL -> cast NULL
    per = (
        base.withColumn("_chg", changed)
        .groupBy("url_key")
        .agg(
            F.count("*").alias("n_obs"),
            F.coalesce(F.sum("_chg"), F.lit(0)).alias("n_changes"),
            F.min("_ts").alias("_t0"),
            F.max("_ts").alias("_t1"),
        )
        .filter(F.col("n_obs") > 1)
    )
    return per.select(
        "url_key",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n_changes").cast("long").alias("n_changes"),
        F.expr("(_t1 - _t0) DIV (n_obs - 1)").cast("long").alias("avg_gap_s"),
        F.expr("(_t1 - _t0) DIV greatest(n_changes, 1)")
        .cast("long")
        .alias("recrawl_s"),
    )
