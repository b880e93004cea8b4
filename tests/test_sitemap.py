"""Sitemap source (sources/sitemap.py): the semantics the driver oracle
can't pin alone — entity unescape, default priority, malformed-entry drop,
index expansion, frontier mapping."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.sources.sitemap import (
    expand_sitemap_index,
    parse_sitemap_entries,
    sitemap_to_frontier,
)

URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "  <url>\n"
    "    <loc> https://a.example.com/p?x=1&amp;y=2 </loc>\n"
    "    <lastmod>2026-03-04</lastmod>\n"
    "    <changefreq>daily</changefreq>\n"
    "    <priority>0.8</priority>\n"
    "  </url>\n"
    "  <url><loc>https://a.example.com/plain</loc></url>\n"
    "  <url><loc>https://a.example.com/bad</loc>"
    "<priority>high</priority></url>\n"
    "  <url><lastmod>2026-01-01</lastmod></url>\n"  # no loc -> dropped
    "</urlset>\n"
)

INDEX = (
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>https://a.example.com/sm-1.xml</loc>"
    "<lastmod>2026-02-01</lastmod></sitemap>"
    "<sitemap><loc>https://a.example.com/sm-2.xml</loc></sitemap>"
    "</sitemapindex>"
)


def test_parse_entries_unescape_defaults_and_drop(spark):
    sm = spark.createDataFrame(
        [("https://a.example.com/sitemap.xml", URLSET)],
        ["sitemap_url", "xml"],
    )
    rows = {r["loc"]: r for r in parse_sitemap_entries(sm).collect()}
    # the loc-less entry is dropped, the other three survive
    assert len(rows) == 3
    full = rows["https://a.example.com/p?x=1&y=2"]  # trimmed + unescaped
    assert full["lastmod"] == "2026-03-04"
    assert full["changefreq"] == "daily"
    assert abs(full["priority"] - 0.8) < 1e-12
    plain = rows["https://a.example.com/plain"]
    assert plain["lastmod"] is None and plain["changefreq"] is None
    assert abs(plain["priority"] - 0.5) < 1e-12  # spec default when absent
    # non-numeric <priority> falls back to the default, not a cast error
    assert abs(rows["https://a.example.com/bad"]["priority"] - 0.5) < 1e-12


def test_amp_entity_decodes_last(spark):
    # '&amp;lt;' must round-trip to the literal text '&lt;', never '<'
    xml = "<urlset><url><loc>https://a.example.com/&amp;lt;x</loc></url></urlset>"
    sm = spark.createDataFrame([("s", xml)], ["sitemap_url", "xml"])
    [row] = parse_sitemap_entries(sm).collect()
    assert row["loc"] == "https://a.example.com/&lt;x"


def test_expand_index(spark):
    idx = spark.createDataFrame(
        [("https://a.example.com/sitemap.xml", INDEX)],
        ["sitemap_url", "xml"],
    )
    rows = {r["child_url"]: r for r in expand_sitemap_index(idx).collect()}
    assert set(rows) == {
        "https://a.example.com/sm-1.xml",
        "https://a.example.com/sm-2.xml",
    }
    assert rows["https://a.example.com/sm-1.xml"]["child_lastmod"] == "2026-02-01"
    assert rows["https://a.example.com/sm-2.xml"]["child_lastmod"] is None


def test_frontier_mapping_recency_tiebreak(spark):
    sm = spark.createDataFrame(
        [("s", URLSET)], ["sitemap_url", "xml"]
    )
    fr = sitemap_to_frontier(parse_sitemap_entries(sm))
    rows = {r["url"]: r for r in fr.collect()}
    # base priority survives; lastmod adds a strictly-sub-milli bonus
    p_full = rows["https://a.example.com/p?x=1&y=2"]["priority"]
    p_plain = rows["https://a.example.com/plain"]["priority"]
    assert 0.8 < p_full < 0.801
    assert p_plain == 0.5
    assert rows["https://a.example.com/plain"]["depth"] == 0
    # parse stage is a pure map: no exchange in the plan
    plan = fr._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_frontier_refill_plan_has_group_limit(spark, tmp_path):
    """The flagship's literal rn<=5 conjunct must plant a WindowGroupLimit
    (the map-side skew guard), and the anti-join must be present."""
    import __spark_entry__ as entry

    df = entry.queries()["frontier_refill"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]
    rows = df.limit(5).collect()
    assert all(r["fetch_slot"] == r["rn"] - 1 for r in rows)


def test_sitemap_diff_nullsafe(spark):
    from etherscan_contract_crawler_spark.sources.sitemap import sitemap_diff

    old = spark.createDataFrame(
        [
            ("u/stay", "2026-01-01"),
            ("u/changed", "2026-01-01"),
            ("u/removed", "2026-01-01"),
            ("u/null-both", None),          # NULL == NULL -> unchanged
            ("u/null-to-val", None),        # NULL -> value = changed
        ],
        "loc string, lastmod string",
    )
    new = spark.createDataFrame(
        [
            ("u/stay", "2026-01-01"),
            ("u/changed", "2026-02-02"),
            ("u/added", "2026-03-03"),
            ("u/null-both", None),
            ("u/null-to-val", "2026-01-05"),
        ],
        "loc string, lastmod string",
    )
    got = {r["loc"]: r for r in sitemap_diff(old, new).collect()}
    # unchanged rows (incl. the NULL<=>NULL pair) never surface
    assert set(got) == {"u/changed", "u/removed", "u/added", "u/null-to-val"}
    assert got["u/changed"]["change"] == "changed"
    assert got["u/removed"]["change"] == "removed"
    assert got["u/removed"]["new_lastmod"] is None
    assert got["u/added"]["change"] == "added"
    assert got["u/added"]["old_lastmod"] is None
    assert got["u/null-to-val"]["change"] == "changed"
