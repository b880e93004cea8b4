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

from pyspark.sql import DataFrame
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
