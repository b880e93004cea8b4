"""Corpus distribution statistics: grouped quantiles of a numeric column.

A training-data curator's standing query — per-language / per-source
length, token-count, and quality-score distributions drive retention
thresholds (corpus_retention's cutoffs come from exactly these numbers).

Two variants behind one signature:
  * ``exact=True`` — ``percentile``: per-group sort-based, interpolated
    (SQL percentile_cont semantics; DuckDB quantile_cont is the oracle).
    The exact variant buffers each group's values — fine for per-language
    rollups (groups ≪ rows), the verification path at any sf.
  * ``exact=False`` — ``approx_percentile``: Greenwald-Khanna sketch,
    O(1/accuracy) memory per group, mergeable map-side — the 100-TB path
    when group cardinality or per-group row counts are unbounded. Same
    output shape; pytest pins approx-vs-exact agreement on skewed data.

Both run as ONE hash aggregate (partial sketches/buffers combine map-side);
no window, no shuffle beyond the single groupBy exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
    round_to: int = 4,
) -> DataFrame:
    """One row per group: p<q> columns (interpolated quantiles) + n rows.

    Column names encode the quantile (0.5 -> p50, 0.99 -> p99) so results
    join/compare cleanly across runs.
    """
    aggs = []
    for q in qs:
        name = f"p{str(q)[2:].ljust(2, '0')}" if q < 1 else "p100"
        if exact:
            col = F.expr(f"percentile({value_col}, {q!r})")
        else:
            col = F.expr(f"approx_percentile({value_col}, {q!r}, {accuracy})").cast(
                "double"
            )
        aggs.append(F.round(col, round_to).alias(name))
    aggs.append(F.count("*").alias("n_rows"))
    return df.groupBy(group_col).agg(*aggs)


def token_budget(
    scored: DataFrame,
    group_col: str = "lang",
    bucket_col: str = "q_bucket",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Token-budget curve per group: for each (group, quality-bucket), the
    doc count, token sum, and the CUMULATIVE token share a curator keeps by
    admitting every bucket at-or-above this one — i.e. "if the quality
    threshold is b, how many training tokens survive per language?" — the
    standing planning query behind retention thresholds and data-mix
    weights.

    Input is pre-scored (doc, group, bucket, n_tokens) rows; output one row
    per (group, bucket): (group, bucket, n_docs, bucket_tokens, cum_tokens,
    cum_share) with cum_* accumulated from the highest bucket downward and
    share rounded to 6 decimals.

    Plan shape: one hash agg to bucket granularity (map-side partials —
    the exchange carries groups × buckets rows, never docs), then the
    cumulative window runs over that TINY aggregate: the window partition
    is a single group's bucket list (≤ a few dozen rows), so the "sort"
    inside the window is negligible at any corpus size.
    """
    per_bucket = scored.groupBy(
        F.col(group_col).alias("grp"), F.col(bucket_col).alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("bucket_tokens"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("bucket").desc())
    tot = Window.partitionBy("grp")
    return per_bucket.select(
        F.col("grp").alias(group_col),
        "bucket",
        "n_docs",
        "bucket_tokens",
        F.sum("bucket_tokens").over(w).cast("long").alias("cum_tokens"),
        F.round(
            F.sum("bucket_tokens").over(w) / F.sum("bucket_tokens").over(tot), 6
        ).alias("cum_share"),
    )
