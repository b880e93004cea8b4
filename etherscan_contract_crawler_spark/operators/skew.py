"""Skew-defusing two-stage (salted) aggregation.

The crawl engine salts hot domains inside ``schedule_epoch``
(operators/politeness.py); this is the same trick generalized to plain
aggregations: append a salt derived from a high-cardinality column, run the
partial aggregate on (key, salt) — so no single reducer owns a hot key —
then combine the partials on key alone. Spark already does partial
aggregation map-side for algebraic aggregates; explicit salting additionally
bounds the *reduce-side* partition for pathologically hot keys (the 100-TB
failure mode AQE's skew handling only covers for joins, not aggs).

Every aggregate passed here must be algebraic (sum/count/min/max — anything
where agg(agg(parts)) == agg(whole)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_src: str,
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: ``aggs`` maps output name -> (partial_expr,
    combine_expr_over_partial). Example::

        salted_agg(li, ["l_returnflag"], "l_orderkey",
                   {"n": (F.count("*"), F.sum("n")),
                    "revenue": (F.sum(rev), F.sum("revenue"))})
    """
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[combine.alias(name) for name, (_, combine) in aggs.items()]
    )
