"""Feed ingest (sources/feeds.py), cache policy (functions/http.py),
robots Sitemap discovery, and tracking-param canonicalization — the edge
semantics the closed-form driver oracles can't exercise: malformed dates,
linkless items, poll-overlap ties, directive-vs-substring traps, and the
all-params-stripped query."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.functions.http import cache_policy
from etherscan_contract_crawler_spark.functions.urls import canonicalize_url
from etherscan_contract_crawler_spark.sources.feeds import (
    latest_per_link,
    parse_feed_items,
)
from etherscan_contract_crawler_spark.sources.sitemap import (
    robots_sitemap_directives,
)

RSS = (
    '<?xml version="1.0"?>\n<rss version="2.0"><channel>\n'
    "<title>chan title is NOT an item</title>\n"
    "<item><title>A</title><link>https://x.com/a?b=1&amp;c=2</link>"
    "<guid>g-a</guid>"
    "<pubDate>Wed, 4 Feb 2026 9:05:07 GMT</pubDate></item>\n"
    "<item><title>no link -> dropped</title><guid>g-x</guid></item>\n"
    "<item><title>bad date</title><link>https://x.com/b</link>"
    "<pubDate>soon</pubDate></item>\n"
    "</channel></rss>"
)


def test_parse_feed_items_edges(spark):
    df = spark.createDataFrame([("f1", RSS)], "feed_url string, xml string")
    rows = {r["link"]: r for r in parse_feed_items(df).collect()}
    # linkless item dropped; channel <title> not lifted as an item
    assert set(rows) == {"https://x.com/a?b=1&c=2", "https://x.com/b"}
    a = rows["https://x.com/a?b=1&c=2"]  # entity-unescaped link
    assert a["title"] == "A" and a["guid"] == "g-a"
    # weekday stripped, 1-digit day/hour parsed
    assert a["pub_ts"] is not None and a["pub_ts"].day == 4
    assert rows["https://x.com/b"]["pub_ts"] is None  # bad date -> NULL


def test_latest_per_link_overlap(spark):
    df = spark.createDataFrame(
        [
            ("https://x.com/a", "v1", "g1", "2026-01-01 00:00:00"),
            ("https://x.com/a", "v2", "g2", "2026-01-08 00:00:00"),
            ("https://x.com/b", "only", "g3", "2026-01-01 00:00:00"),
            # equal timestamps: guid is the deterministic tiebreak (max)
            ("https://x.com/c", "t1", "g4", "2026-01-02 00:00:00"),
            ("https://x.com/c", "t2", "g5", "2026-01-02 00:00:00"),
        ],
        "link string, title string, guid string, pub_ts string",
    ).withColumn("pub_ts", F.to_timestamp("pub_ts"))
    got = {r["link"]: r for r in latest_per_link(df).collect()}
    assert len(got) == 3
    assert got["https://x.com/a"]["title"] == "v2"
    assert got["https://x.com/b"]["title"] == "only"
    assert got["https://x.com/c"]["guid"] == "g5"


ROBOTS = (
    "User-agent: *\nDisallow: /tmp\n"
    "SiteMap:https://a.com/s1.xml\n"          # no space, mixed case
    "  sitemap :  https://a.com/s2.xml  \n"   # indented, spaced colon
    "# Sitemap: https://a.com/commented.xml is still lifted per spec-less\n"
)


def test_robots_sitemap_directives(spark):
    df = spark.createDataFrame(
        [("a.com", ROBOTS), ("b.com", "User-agent: *\nDisallow: /")],
        "domain string, body string",
    )
    got = robots_sitemap_directives(df).collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r["sitemap_url"])
    # b.com has no directive -> zero rows; the commented line starts with
    # '#' so the anchored ^[ \t]* match rejects it
    assert "b.com" not in by_dom
    assert sorted(by_dom["a.com"]) == [
        "https://a.com/s1.xml", "https://a.com/s2.xml",
    ]


def test_canonicalize_drop_tracking_edges(spark):
    df = spark.createDataFrame(
        [
            # ALL params are tracking -> '?' disappears entirely
            ("https://a.com/p?utm_source=x&gclid=1",),
            # 'utm_' in a VALUE (not key) survives; key match is anchored
            ("https://a.com/p?q=utm_source&a=1",),
        ],
        "url string",
    )
    got = [
        r[0]
        for r in df.select(
            canonicalize_url("url", drop_tracking=True)
        ).collect()
    ]
    assert got[0] == "https://a.com/p"
    assert got[1] == "https://a.com/p?a=1&q=utm_source"


def test_cache_policy_ladder(spark):
    cases = [
        # no-store wins over a validator: never revalidate, never reuse
        ("Cache-Control: no-store\nETag: \"e\"", 0, False, "no_store"),
        ("cache-control: No-Cache\nLast-Modified: x", 0, True, "revalidate"),
        ("Cache-Control: max-age=0\nETag: \"e\"", 0, True, "revalidate"),
        ("Cache-Control: public, max-age=600", 600, False, "hourly"),
        ("Cache-Control: max-age=7200\nETag: \"e\"", 7200, True, "daily"),
        ("Cache-Control: max-age=604800", 604800, False, "weekly"),
        ("Server: nginx", 86400, False, "default"),
        # max-age must be a cache-control DIRECTIVE, not any substring of
        # the header block (an ETag value can't set the ttl)
        ("ETag: \"max-age=5\"", 86400, True, "default"),
    ]
    df = spark.createDataFrame([(h,) for h, *_ in cases], "h string")
    got = df.select(cache_policy("h").alias("p")).select("p.*").collect()
    for (h, ttl, reval, lane), r in zip(cases, got):
        assert (r["ttl_s"], r["revalidate"], r["lane"]) == (ttl, reval, lane), h


def test_boilerplate_strip_edges(spark):
    from etherscan_contract_crawler_spark.analytics.text import (
        boilerplate_strip,
    )

    rows = []
    # domain "big": 4 pages sharing a nav line; page 0 is ALL boilerplate;
    # page 1 repeats the nav INSIDE the page (df counts pages, not lines)
    rows.append((0, "big", "NAV"))
    rows.append((1, "big", "NAV\nNAV\nbody one"))
    rows.append((2, "big", "NAV\nbody two"))
    rows.append((3, "big", "NAV\nbody three"))
    # domain "tiny": 2 identical pages — below min_pages, kept verbatim
    rows.append((10, "tiny", "same\nsame"))
    rows.append((11, "tiny", "same\nsame"))
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    got = {r["doc_id"]: r for r in
           boilerplate_strip(df, min_frac=0.6, min_pages=3).collect()}
    assert len(got) == 6
    # NAV is on 4/4 big pages -> stripped everywhere, incl. both repeats
    assert got[0]["kept_text"] == "" and got[0]["n_boiler_lines"] == 1
    assert got[1]["kept_text"] == "body one" and got[1]["n_boiler_lines"] == 2
    assert got[2]["kept_text"] == "body two"
    assert got[3]["n_lines"] == 2
    # tiny domain: below min_pages, nothing stripped
    assert got[10]["kept_text"] == "same\nsame"
    assert got[10]["n_boiler_lines"] == 0


def test_html_to_text_edges(spark):
    from etherscan_contract_crawler_spark.functions.html import (
        html_title,
        html_to_text,
    )

    pages = [
        # comment-wrapped script must not resurrect; entity round-trip:
        # &amp;lt; decodes to the literal text "&lt;", not to "<"
        ("<body><!--<script>x()</script>--><p>a&amp;lt;b</p></body>", None,
         "a&lt;b"),
        # script containing a '<' and a '</div>' inside a string: the lazy
        # block match still ends at the REAL </script> (a literal
        # '</script>' inside a string would end it early — exactly what
        # browsers do too)
        ('<script>if (1<2) s="</div>";</script>ok', None, "ok"),
        # style + nbsp + adjacent blocks must not weld
        ("<style>p{}</style><p>x</p><p>y</p>", None, "x y"),
        # title lifted + decoded; absent title -> NULL
        ("<head><title> A &amp; B </title></head><body>t</body>", "A & B",
         "A & B t"),
    ]
    df = spark.createDataFrame([(p,) for p, _, _ in pages], "h string")
    got = df.select(
        html_title("h").alias("t"), html_to_text("h").alias("x")
    ).collect()
    for (page, want_t, want_x), r in zip(pages, got):
        assert r["t"] == want_t, page
        assert r["x"] == want_x, page
