"""Robots acquisition + enforcement: parse semantics and the parity-style
guarantee that a disallowed path never appears in a scheduled batch."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.operators.politeness import schedule_epoch
from etherscan_contract_crawler_spark.operators.robots import (
    acquire_robots,
    parse_robots,
    synthetic_robots_session,
)
from etherscan_contract_crawler_spark.sources.seeds import seeds_to_frontier


def test_parse_robots_semantics():
    body = """
# comment
User-agent: google-bot
Disallow: /only-google

User-agent: *
Disallow: /private   # trailing comment
Disallow: /tmp
Disallow:
Allow: /tmp/ok
Crawl-delay: 10

User-agent: other
User-agent: *
Disallow: /shared
"""
    assert parse_robots(body) == ["/private", "/shared", "/tmp"]
    assert parse_robots(None) == []
    assert parse_robots("User-agent: *\nDisallow:\n") == []
    assert parse_robots("User-agent: x\nDisallow: /a\n") == []


def test_disallowed_path_never_scheduled(spark, tiny_seeds_df):
    """Parity-style gate (r1 VERDICT #10 'done' criterion): with the robots
    dim acquired through the fetch harness, no scheduled URL's path matches a
    disallowed prefix for its domain — and the check is non-vacuous (such
    URLs exist in pending and would be scheduled without the dim)."""
    frontier, _ = seeds_to_frontier(tiny_seeds_df, n_buckets=8, epoch=0)
    robots = acquire_robots(frontier, synthetic_robots_session)
    rules = {r["domain"]: r["disallow"] for r in robots.collect()}
    assert rules, "synthetic robots produced no rules — fixture broke"

    def blocked_count(df):
        n = 0
        for r in df.select("domain", "url_canon").collect():
            path = "/" + r["url_canon"].split("/", 3)[-1]
            if any(path.startswith(p) for p in rules.get(r["domain"], [])):
                n += 1
        return n

    unfiltered = schedule_epoch(frontier, epoch_duration_s=3600)
    assert blocked_count(unfiltered) > 0, "no blockable URLs — vacuous test"
    filtered = schedule_epoch(frontier, robots=robots, epoch_duration_s=3600)
    assert blocked_count(filtered) == 0
    # allowed URLs on rule-bearing domains still get through
    allowed_on_ruled = filtered.filter(
        F.col("domain").isin(*rules.keys())
    ).count()
    assert allowed_on_ruled > 0


def test_parse_robots_full_crawl_delay():
    from etherscan_contract_crawler_spark.operators.robots import (
        parse_robots_full,
    )

    dis, allow, delay = parse_robots_full(
        "User-agent: fancy-bot\nCrawl-delay: 99\n\n"   # wrong group: ignored
        "User-agent: *\nDisallow: /x\n"
        "Crawl-delay: oops\n"                          # non-numeric: ignored
        "Crawl-delay: 2.5\n"
        "Crawl-delay: 7 # last valid one wins\n\n"
        "User-agent: other\nCrawl-delay: -3\n"         # wrong group anyway
    )
    assert dis == ["/x"]
    assert delay == 7.0
    assert parse_robots_full(None) == ([], [], None)
    assert parse_robots_full("User-agent: *\nCrawl-delay: -1\n") == ([], [], None)


def test_budgets_with_crawl_delay_fold(spark):
    from etherscan_contract_crawler_spark.operators.politeness import (
        budgets_with_crawl_delay,
    )

    budgets = spark.createDataFrame(
        [("a", 4, 2.0), ("b", 3, 1.0)],
        "domain string, max_calls int, period_s double",
    )
    robots = spark.createDataFrame(
        [
            ("a", [], 0.5),    # declared delay BELOW own period: period wins
            ("c", [], 10.0),   # delay-only domain enters the dim
            ("d", [], None),   # no delay: filtered out, not a budget row
        ],
        "domain string, disallow array<string>, crawl_delay double",
    )
    got = {r["domain"]: (r["max_calls"], r["period_s"])
           for r in budgets_with_crawl_delay(budgets, robots).collect()}
    assert got == {"a": (1, 2.0), "b": (3, 1.0), "c": (1, 10.0)}
    # budgets=None: only declaring domains, floored at the default period
    got2 = {r["domain"]: (r["max_calls"], r["period_s"])
            for r in budgets_with_crawl_delay(None, robots).collect()}
    assert got2 == {"a": (1, 1.0), "c": (1, 10.0)}


def test_robots_longest_match_allow(spark):
    from etherscan_contract_crawler_spark.operators.politeness import (
        robots_filter,
    )
    from etherscan_contract_crawler_spark.operators.robots import (
        parse_robots_full,
    )

    # RFC 9309 example shape: a carve-out under a blocked subtree
    dis, alw, _ = parse_robots_full(
        "User-agent: *\nDisallow: /private\nAllow: /private/pub\n"
        "Disallow: /wild*card\nAllow:\n"   # wildcard kept VERBATIM
    )
    assert dis == ["/private", "/wild*card"] and alw == ["/private/pub"]

    robots = spark.createDataFrame(
        [("a.com", dis, alw, None)],
        "domain string, disallow array<string>, allow array<string>, "
        "crawl_delay double",
    )
    urls = [
        ("a.com", "https://a.com/private/x", False),      # disallow wins
        ("a.com", "https://a.com/private/pub/ok", True),  # longer allow wins
        ("a.com", "https://a.com/public", True),          # no rule matches
        ("a.com", "https://a.com/wildANYcard", False),    # * spans octets
        ("a.com", "https://a.com/wilder", True),          # no prefix over-block
        ("b.com", "https://b.com/private/x", True),       # no dim row
    ]
    pending = spark.createDataFrame(
        [(d, u, u) for d, u, _ in urls],
        "domain string, url string, url_canon string",
    )
    kept = {r["url"] for r in robots_filter(pending, robots).collect()}
    for d, u, want in urls:
        assert (u in kept) == want, u


def test_meta_robots_union_and_token_safety(spark):
    """Header and meta UNION (most restrictive wins); 'none' implies both;
    token match doesn't fire inside words; non-robots meta names ignored."""
    from etherscan_contract_crawler_spark.functions.html import meta_robots

    rows = [
        # headers, body, want_noindex, want_nofollow
        ("X-Robots-Tag: noindex", "<p>x</p>", True, False),
        ("Server: x", '<meta name="robots" content="NOFOLLOW , noarchive">', False, True),
        ("Server: x", "<META CONTENT='none' NAME=robots>", True, True),
        ("Server: x", '<meta name="googlebot" content="noindex">', False, False),
        ("x-robots-tag: nosnippet", '<meta name="robots" content="nonoindexed">', False, False),
        ("X-Robots-Tag: noindex", '<meta name="robots" content="nofollow">', True, True),
        ("Server: x", "<p>plain</p>", False, False),
    ]
    df = spark.createDataFrame(
        [(h, b) for h, b, _, _ in rows], "headers string, body string"
    )
    got = df.select(meta_robots("headers", "body").alias("m")).collect()
    for r, (h, b, ni, nf) in zip(got, rows):
        assert (r.m.noindex, r.m.nofollow) == (ni, nf), (h, b)


def test_robots_wildcard_and_dollar_semantics(spark):
    from etherscan_contract_crawler_spark.operators.politeness import (
        robots_filter,
    )

    robots = spark.createDataFrame(
        [("a.com",
          ["/address/0x0*", "/files/*.pdf$", "/*/tmp/", "/a$b"],
          ["/address/0x00*"],
          None)],
        "domain string, disallow array<string>, allow array<string>, "
        "crawl_delay double",
    )
    urls = [
        # carve-out: allow '/address/0x00*' (14) beats dis '/address/0x0*' (13)
        ("https://a.com/address/0x00cafe", True),
        ("https://a.com/address/0x0beef", False),
        # terminal $ anchors: .pdf blocked, .pdfx and mid-path .pdf/ not
        ("https://a.com/files/doc7.pdf", False),
        ("https://a.com/files/doc7.pdfx", True),
        ("https://a.com/files/sub/doc.pdf", False),   # * spans '/'
        # mid-path wildcard, unanchored tail
        ("https://a.com/x/tmp/page", False),
        ("https://a.com/tmp/page", True),             # '*' needs >= '/x'? no:
        # '^/.*/tmp/' — '/tmp/page' has no second '/..../tmp/' = kept? NO:
        # '.*' may be EMPTY, '^//tmp/' doesn't match '/tmp/page' -> kept
        # mid-rule '$' is a literal octet, not an anchor
        ("https://a.com/a$b/c", False),
        ("https://a.com/ab/c", True),
    ]
    pending = spark.createDataFrame(
        [("a.com", u, u) for u, _ in urls],
        "domain string, url string, url_canon string",
    )
    kept = {r["url"] for r in robots_filter(pending, robots).collect()}
    for u, want in urls:
        assert (u in kept) == want, u
