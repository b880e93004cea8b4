"""Event sessionization — gap-based session ids via lag + running sum.

The crawl engine's politeness scheduler (operators/politeness.py) uses only
row_number; this operator covers the lag/lead + cumulative-frame window
family over the events table: a new session starts when the gap to the
previous event of the same user exceeds ``gap_s``. Session id = running
count of session starts — one shuffle on user_id, both windows share the
same partitioning so Spark plans a single exchange + sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, event_id, ts, session_idx, is_new_session) with session_idx
    numbered 1.. per user in event-time order (ties broken by event id)."""
    order = [F.asc(ts_col), F.asc(id_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_s),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("is_new_session", is_new)
        .withColumn("session_idx", F.sum("is_new_session").over(wsum).cast("int"))
        .select(user_col, id_col, ts_col, "session_idx", "is_new_session")
    )


def session_stats(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Per-session aggregates: event count and duration seconds."""
    s = sessionize(events, gap_s)
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).cast("long").alias("duration_s"),
    )
