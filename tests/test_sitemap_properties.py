"""Property-based round-trip for the sitemap parser (sources/sitemap.py):
generated entries → built XML (entity-escaped locs, random pretty-printing,
optional fields) → parse_sitemap_entries → exact recovery. Pins the regex
lift against the escaping and whitespace variance real sitemaps ship."""

from xml.sax.saxutils import escape

from hypothesis import given, settings
from hypothesis import strategies as st

from etherscan_contract_crawler_spark.sources.sitemap import (
    parse_sitemap_entries,
)

# locs exercise the five XML entities plus query/path syntax
loc_chars = st.text(
    alphabet="abcXYZ019-._~/?=&<>'\"", min_size=1, max_size=24
).map(lambda s: "https://ex.com/" + s)

entry = st.fixed_dictionaries(
    {
        "loc": loc_chars,
        "lastmod": st.one_of(st.none(), st.sampled_from(
            ["2026-01-02", "2025-12-31T23:59:59+00:00"])),
        "priority": st.one_of(st.none(), st.sampled_from(
            ["0.0", "0.5", "1.0", "0.8", "broken"])),
        "pretty": st.booleans(),
    }
)


def build_xml(entries):
    parts = ['<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for e in entries:
        nl = "\n  " if e["pretty"] else ""
        s = f"<url>{nl}<loc>{escape(e['loc'])}</loc>"
        if e["lastmod"]:
            s += f"{nl}<lastmod>{e['lastmod']}</lastmod>"
        if e["priority"] is not None:
            s += f"{nl}<priority>{e['priority']}</priority>"
        s += f"{nl}</url>"
        parts.append(s)
    parts.append("</urlset>")
    return ("\n".join(parts)) if entries and entries[0]["pretty"] else "".join(parts)


@settings(max_examples=10, deadline=None)
@given(st.lists(entry, min_size=1, max_size=12))
def test_sitemap_roundtrip(spark, entries):
    # the parser keys rows only by sitemap_url; give each entry a unique loc
    # suffix so recovery is positionally checkable as a multiset
    for i, e in enumerate(entries):
        e["loc"] = f"{e['loc']}#_{i}"  # '#' is legal inside a loc VALUE
    df = spark.createDataFrame(
        [("sm1", build_xml(entries))], "sitemap_url string, xml string"
    )
    got = sorted(
        (r["loc"], r["lastmod"], r["priority"])
        for r in parse_sitemap_entries(df).collect()
    )
    want = sorted(
        (
            e["loc"],
            e["lastmod"],
            float(e["priority"])
            if e["priority"] not in (None, "broken") else 0.5,
        )
        for e in entries
    )
    assert got == want
