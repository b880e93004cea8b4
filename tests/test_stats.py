"""Grouped quantiles: exact interpolation semantics, approx-vs-exact
agreement on skewed data, and single-aggregate plan shape."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.stats import grouped_quantiles


def test_exact_interpolation_small_group(spark):
    # values 10,20,30,40: p50 = 25.0 (percentile_cont), p90 = 37.0
    df = spark.createDataFrame(
        [("a", v) for v in (10, 20, 30, 40)], "g string, v long"
    )
    row = grouped_quantiles(df, "v", "g", qs=(0.5, 0.9)).collect()[0]
    assert (row["p50"], row["p90"], row["n_rows"]) == (25.0, 37.0, 4)


def test_approx_tracks_exact_on_skewed_groups(spark):
    # zipf-ish: one huge group, one tiny; deterministic values
    rows = [("big", (i * i) % 9973) for i in range(20000)] + [
        ("tiny", v) for v in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "g string, v long").repartition(8)
    exact = {
        r["g"]: (r["p50"], r["p99"])
        for r in grouped_quantiles(df, "v", "g").collect()
    }
    approx = {
        r["g"]: (r["p50"], r["p99"])
        for r in grouped_quantiles(df, "v", "g", exact=False).collect()
    }
    for g in exact:
        for e, a in zip(exact[g], approx[g]):
            # GK sketch at accuracy=10k on <=20k rows: rank error <= ~2
            # ranks; approx also returns a real element where exact
            # interpolates (e.g. tiny's p99 = 2.98 vs element 3)
            assert abs(e - a) <= max(20.0, 0.01 * e)


def test_single_aggregate_no_window(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    plan = (
        grouped_quantiles(df, "v", "g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert plan.count("Exchange") == 1  # the single groupBy shuffle
