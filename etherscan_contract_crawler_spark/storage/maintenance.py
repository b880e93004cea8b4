"""Table-maintenance PLANNING operators — the Iceberg housekeeping a
10^10-row landing table needs, expressed as pure DataFrame plans.

The reference has no table layer at all (one file per contract,
contract_crawler.py:242-248); this engine lands epochs into a
snapshot/manifest table (storage/icetable.py), and at 100 TB the two
maintenance jobs that keep it healthy are `rewrite_data_files` (small-file
compaction) and `expire_snapshots`. Real Iceberg executes those through
its own actions; what a PySpark-native engine owns is the PLANNING —
which files form which compaction bins, which snapshots expire — and that
is exactly the part that must scale (file/manifest listings are
themselves millions of rows at 10^10 data rows). Both planners are pure
column plans: one window exchange each, no driver-side listing loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rewrite_data_files_plan(
    files: DataFrame,
    target_bytes: int = 512 << 20,
    small_threshold: int = 256 << 20,
    min_input_files: int = 2,
    partition_col: str = "part_id",
    file_col: str = "file_id",
    bytes_col: str = "n_bytes",
) -> DataFrame:
    """Small-file compaction plan (Iceberg ``rewrite_data_files`` analog).

    Files under ``small_threshold`` are candidates; within each table
    partition the candidates pack greedily into bins of ~``target_bytes``
    (a file belongs to bin ``floor(cum_before / target)`` — the same
    close-when-full rule the WARC packer uses, so a bin may overrun by at
    most one file). A bin rewrites only if it holds at least
    ``min_input_files`` files — rewriting a lone small file buys nothing.
    Files at/above the threshold pass through with a NULL bin.

    Returns one row per input file:
    ``(part_id, file_id, n_bytes, bin, do_rewrite)``.

    Scale: ONE exchange (hash on partition) for the window; the
    per-(part_id, bin) rollup that decides ``do_rewrite`` rides the same
    partitioning as a second window (no re-shuffle). The sort key includes
    ``(file_id, n_bytes)`` so duplicate ids cannot make bins
    partition-merge-order dependent.
    """
    cand = files.select(
        F.col(partition_col).alias("part_id"),
        F.col(file_col).alias("file_id"),
        F.col(bytes_col).cast("long").alias("n_bytes"),
    ).filter(F.col("n_bytes") < small_threshold)
    w = Window.partitionBy("part_id").orderBy("file_id", "n_bytes")
    w_cum = w.rowsBetween(Window.unboundedPreceding, -1)
    binned = cand.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("n_bytes").over(w_cum), F.lit(0))
            / F.lit(int(target_bytes))
        ).cast("long"),
    )
    w_bin = Window.partitionBy("part_id", "bin")
    planned = binned.withColumn(
        "do_rewrite", F.count("*").over(w_bin) >= min_input_files
    )
    passthrough = (
        files.select(
            F.col(partition_col).alias("part_id"),
            F.col(file_col).alias("file_id"),
            F.col(bytes_col).cast("long").alias("n_bytes"),
        )
        .filter(F.col("n_bytes") >= small_threshold)
        .withColumn("bin", F.lit(None).cast("long"))
        .withColumn("do_rewrite", F.lit(False))
    )
    return planned.unionByName(passthrough)


def snapshot_expiry_plan(
    snapshots: DataFrame,
    retain_last: int = 5,
    retain_s: int = 7 * 24 * 3600,
    id_col: str = "snapshot_id",
    ts_col: str = "committed_at_s",
    ref_col: str = "is_ref_head",
) -> DataFrame:
    """Snapshot retention plan (Iceberg ``expire_snapshots`` analog).

    A snapshot is KEPT if any holds: it is one of the ``retain_last``
    newest, it is younger than ``retain_s`` relative to the NEWEST
    snapshot's timestamp (data-derived "now" — the plan is deterministic
    and replayable, no wall clock), or a branch/tag head points at it.
    ``reason`` reports the strongest keep rule (head > retain_last >
    recent) or 'expire'.

    Returns ``(snapshot_id, committed_at_s, age_rank, keep, reason)``.

    Scale: snapshot listings are table-count x history-sized (small next
    to data, large next to a driver loop) — one global window over a
    single partition would serialize, so the rank runs per table when a
    ``partition`` column exists; for the single-table frame here the
    window is history-sized, bounded by snapshot retention itself.
    """
    w = Window.orderBy(F.desc(ts_col), F.desc(id_col))
    now = F.max(F.col(ts_col)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ranked = snapshots.select(
        F.col(id_col).alias("snapshot_id"),
        F.col(ts_col).cast("long").alias("committed_at_s"),
        F.col(ref_col).alias("_head"),
        F.row_number().over(w).alias("age_rank"),
        (F.col(ts_col) >= now - F.lit(int(retain_s))).alias("_recent"),
    )
    reason: Column = (
        F.when(F.col("_head"), F.lit("head"))
        .when(F.col("age_rank") <= retain_last, F.lit("retain_last"))
        .when(F.col("_recent"), F.lit("recent"))
        .otherwise(F.lit("expire"))
    )
    return ranked.select(
        "snapshot_id",
        "committed_at_s",
        F.col("age_rank").cast("int").alias("age_rank"),
        (reason != "expire").alias("keep"),
        reason.alias("reason"),
    )
