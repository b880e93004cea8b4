"""Round-4 batch 4: politeness compliance audit + tracking-param mining —
branch semantics the oracles can't pin alone (trailing-window boundary,
per-domain budget variation, the dispersion flag rule at its integer
boundary)."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.functions.urls import tracking_param_mine
from etherscan_contract_crawler_spark.operators.politeness import (
    rate_compliance_audit,
)


def _log(spark, rows):
    return spark.createDataFrame(rows, ["domain", "ts_s"])


def _bud(spark, rows):
    return spark.createDataFrame(rows, ["domain", "max_per_window"])


def test_rate_compliance_trailing_window_boundary(spark):
    # window 10 s: fetches at t=0..9 are one window (10 in-window at t=9);
    # t=10 only sees t=1..10
    rows = [("d1", t) for t in range(11)]
    out = rate_compliance_audit(
        _log(spark, rows), _bud(spark, [("d1", 10)]), window_s=10
    ).collect()[0]
    assert out["peak_in_window"] == 10
    assert out["n_violations"] == 0 and out["compliant"] is True
    # budget 9: both the t=9 and t=10 windows hold 10 fetches
    out = rate_compliance_audit(
        _log(spark, rows), _bud(spark, [("d1", 9)]), window_s=10
    ).collect()[0]
    assert out["n_violations"] == 2 and out["compliant"] is False


def test_rate_compliance_budgets_are_per_domain(spark):
    rows = [("a", 0), ("a", 1), ("b", 0), ("b", 1)]
    out = {
        r["domain"]: r["compliant"]
        for r in rate_compliance_audit(
            _log(spark, rows), _bud(spark, [("a", 1), ("b", 2)]), window_s=10
        ).collect()
    }
    assert out == {"a": False, "b": True}


def test_rate_compliance_same_second_burst_counts_together(spark):
    rows = [("d1", 5)] * 4
    out = rate_compliance_audit(
        _log(spark, rows), _bud(spark, [("d1", 3)]), window_s=10
    ).collect()[0]
    assert out["peak_in_window"] == 4 and out["n_violations"] == 4


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def test_tracking_param_mine_dispersion_flags_session_not_page(spark):
    urls = [f"https://e.com/a?page={i % 2}&sid=v{i}" for i in range(60)]
    out = {r["param"]: r for r in tracking_param_mine(_urls(spark, urls), min_urls=50).collect()}
    assert out["sid"]["candidate"] is True
    assert out["sid"]["n_distinct_vals"] == 60
    assert out["page"]["candidate"] is False
    assert out["page"]["n_distinct_vals"] == 2


def test_tracking_param_mine_min_urls_floor(spark):
    urls = [f"https://e.com/a?tok=v{i}" for i in range(49)]
    out = tracking_param_mine(_urls(spark, urls), min_urls=50).collect()[0]
    assert out["candidate"] is False  # dispersion 1.0 but too rare


def test_tracking_param_mine_integer_boundary_9_of_10(spark):
    # exactly 90% distinct values over occurrences: 10*9 >= 9*10 ->
    # candidate (>= is inclusive); the 10th URL is distinct but repeats v0
    urls = [f"https://e.com/a{i}?x=v{i}" for i in range(9)] + [
        "https://e.com/b?x=v0"
    ]
    out = tracking_param_mine(_urls(spark, urls), min_urls=10).collect()[0]
    assert (out["n_urls"], out["n_occurrences"], out["n_distinct_vals"]) == (
        10, 10, 9,
    )
    assert out["candidate"] is True


def test_tracking_param_mine_counts_urls_not_occurrences(spark):
    # multi-valued ?tag=a&tag=b on every URL: occurrences double but the
    # frequency floor sees DISTINCT URLs (the review-caught inflation bug)
    urls = [f"https://e.com/p{i}?tag=a&tag=b" for i in range(30)]
    out = tracking_param_mine(_urls(spark, urls), min_urls=50).collect()[0]
    assert out["n_urls"] == 30 and out["n_occurrences"] == 60
    assert out["candidate"] is False  # 30 URLs < 50, despite 60 occurrences


def test_tracking_param_mine_valueless_and_fragment(spark):
    # a bare flag param counts with empty value; fragments never parse;
    # a repeated identical URL contributes occurrences, not URL count
    urls = ["https://e.com/a?flag", "https://e.com/a?flag", "https://e.com/a#?notaquery=1"]
    out = {r["param"]: r for r in tracking_param_mine(_urls(spark, urls), min_urls=1).collect()}
    assert out["flag"]["n_urls"] == 1 and out["flag"]["n_occurrences"] == 2
    assert out["flag"]["n_distinct_vals"] == 1
    assert "notaquery" not in out
