"""Watermark lateness accounting — size a watermark BEFORE deploying it.

Structured Streaming drops (or state-purges past) events older than the
watermark; choosing the delay is a data question: how late does this
stream actually run? This operator replays a captured stream in arrival
order and measures per-partition event-time lateness against the running
high-water mark — exactly the quantity Spark's per-partition watermark
tracker sees (the global watermark is the min of these per-partition
maxima, so per-partition lateness is the conservative audit). The output
says what fraction of events a ``withWatermark(ts, W)`` would have
treated as late, per partition, for the W under consideration.

The reference has no event-time logic at all (blocks arrive in order,
SURVEY.md §2.8 ⊘) — this is the engine-side operator that makes the
``withWatermark`` knobs on the monitor face (streaming/monitor.py)
evidence-based rather than guessed.

Scale notes: ONE exchange on the partition key — the arrival-order
running max, the lateness rank (a second SORT, same partitioning, no
new shuffle), and the final rollup all ride it. Integer seconds end to
end, so the DuckDB oracle is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def watermark_lateness_audit(
    events: DataFrame,
    watermark_s: int,
    part_col: str = "part",
    ts_col: str = "ts",
    arrival_col: str = "arrival_id",
) -> DataFrame:
    """Per-partition lateness profile of a captured stream.

    ``arrival_col`` is the replay order (offset / monotonically-assigned
    id); lateness of an event = high-water(partition, arrival so far) -
    its own event time. Returns one row per partition:
    (part, n_events, n_late, max_late_s, p99_late_s) where ``n_late``
    counts events later than ``watermark_s`` and p99 is the exact
    integer 99th-percentile lateness (nearest-rank, deterministic).
    """
    ts_s = F.unix_timestamp(F.col(ts_col)).cast("long")
    base = events.select(
        F.col(part_col).alias("part"),
        ts_s.alias("_ts"),
        F.col(arrival_col).alias("_arr"),
    )
    w = (
        Window.partitionBy("part")
        .orderBy("_arr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = (F.max("_ts").over(w) - F.col("_ts")).alias("late_s")
    scored = base.select("part", late)
    # exact nearest-rank p99 inside the same partitioning: rank within
    # partition by lateness, pick the ceil(0.99 * n)-th value
    w_rank = Window.partitionBy("part").orderBy("late_s")
    ranked = scored.select(
        "part",
        "late_s",
        F.row_number().over(w_rank).alias("_rn"),
        F.count("*").over(Window.partitionBy("part")).alias("_n"),
    )
    return (
        ranked.groupBy("part")
        .agg(
            F.max("_n").cast("long").alias("n_events"),
            F.sum(
                (F.col("late_s") > F.lit(int(watermark_s))).cast("long")
            ).alias("n_late"),
            F.max("late_s").cast("long").alias("max_late_s"),
            F.max(
                F.when(
                    F.col("_rn") == F.expr("CAST(ceil(_n * 0.99) AS BIGINT)"),
                    F.col("late_s"),
                )
            )
            .cast("long")
            .alias("p99_late_s"),
        )
    )


def crawl_sessions(
    events: DataFrame,
    gap_s: int = 600,
    key_col: str = "domain",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-domain fetch sessions via Spark's ``session_window`` — bursts of
    activity separated by ≥ ``gap_s`` of silence collapse into one session
    row (start, end, n_fetches). The crawl-ops read on a landing log:
    session count and length per domain profile how bursty the scheduler
    actually is against a domain, the input to politeness retuning; the
    reference has no notion of time at all (sequential loop).

    Uses the dynamic-gap session window primitive in BATCH mode — the
    same expression works unchanged under ``readStream`` with a
    watermark, which is why this operator lives in the streaming layer.
    The DuckDB oracle re-derives the identical sessions with the classic
    gaps-and-islands chain (lag + boundary flag + running sum), pinning
    the primitive's boundary semantics: an event EXACTLY ``gap_s`` after
    the previous one still extends the session — only a STRICTLY greater
    gap splits (verified empirically; the oracle encodes
    ``ts - prev_ts > gap_s``).

    Returns ``(domain, session_start_s, session_end_s, n_fetches)`` with
    second-granularity BIGINT bounds (``session_end_s`` = last event ts,
    not the window close). One exchange on (key, window).
    """
    w = F.session_window(F.col(ts_col), f"{int(gap_s)} seconds")
    agg = (
        events.groupBy(F.col(key_col).alias("domain"), w.alias("_w"))
        .agg(
            F.count("*").cast("long").alias("n_fetches"),
            F.max(F.col(ts_col)).alias("_last"),
        )
    )
    return agg.select(
        "domain",
        F.unix_timestamp(F.col("_w.start")).cast("long").alias("session_start_s"),
        F.unix_timestamp(F.col("_last")).cast("long").alias("session_end_s"),
        "n_fetches",
    )
