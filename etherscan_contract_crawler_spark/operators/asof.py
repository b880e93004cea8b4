"""As-of join: attach the most recent right-side row at or before each
left-side timestamp, per key — in ONE shuffle.

Crawl uses: join each fetch attempt to the robots snapshot in force at
attempt time; join a URL's fetch to the latest-known per-domain budget
revision; attribute a click event to the view that preceded it. The
reference has no temporal joins (it re-reads state synchronously per row,
contract_crawler.py:384); at scale "latest row ≤ t per key" is a core
primitive.

Why not a range join: ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` +
argmax explodes to O(|matches|) intermediate rows (every earlier right row
per left row) before the window prunes — on a 100-TB event table that is
the plan that never finishes. The union-window formulation below shuffles
each input row exactly once:

  1. tag rows (right = 0, left = 1), align schemas (left's payload columns
     null on right rows and vice versa);
  2. one window ``partitionBy(key) orderBy(ts, side, tiebreak)`` computing
     ``last(value, ignorenulls=True)`` over unbounded-preceding..current —
     right rows sorting BEFORE left rows at equal ts gives the inclusive
     (``ts_left >= ts_right``) as-of semantics;
  3. keep left rows.

Cost: one Exchange(key) + one in-partition sort. The window state is one
value per partition cursor — no buffering of the right side.

Determinism: if the right side can hold several rows at the same (key, ts),
callers must reduce it to one row per (key, ts) first (DuckDB's ASOF JOIN —
the oracle — picks an arbitrary one among ties; this operator would pick
the max tiebreak). The driver query pre-aggregates for exactly that reason.

Skew: a hot key is bounded the same way the scheduler's admission window is
(operators/politeness.py) — but as-of carries state across the whole
partition, so the guard here is ``spark.sql.adaptive.enabled`` skew-split is
NOT applicable (window must see the full key); for truly pathological keys,
range-bucket the timestamp into coarse epochs, run the as-of per
(key, epoch) and carry each epoch's closing value forward — not needed at
current scales, documented for the 100-TB deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_s: float | None = None,
) -> DataFrame:
    """Backward as-of join (inclusive): for each ``left`` row, the latest
    ``right`` row with ``right.ts <= left.ts`` and equal ``on`` keys.

    Returns all ``left`` columns plus each requested ``right_cols`` column
    (null when no prior right row exists) and ``asof_ts`` (the matched right
    timestamp). ``tolerance_s``: nulls out matches older than the window.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in keys + [ts]
    ]
    left_payload = [c for c in left.columns if c not in keys + [ts]]

    r = right.select(
        *keys,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(ts).alias("_r_ts"),
    )
    l = left.select(
        *keys,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *left_payload,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("_r_ts"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).select(
        *keys,
        "_ts",
        "_side",
        *left_payload,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in right_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance_s is not None:
        in_win = F.col("asof_ts").isNotNull() & (
            F.col("_ts").cast("double") - F.col("asof_ts").cast("double")
            <= F.lit(float(tolerance_s))
        )
        out = out.select(
            *keys,
            "_ts",
            *left_payload,
            *[
                F.when(in_win, F.col(f"_f_{c}")).alias(f"_f_{c}")
                for c in right_cols
            ],
            F.when(in_win, F.col("asof_ts")).alias("asof_ts"),
        )
    renames = {f"_f_{c}": c for c in right_cols}
    renames["_ts"] = ts
    return out.withColumnsRenamed(renames)
