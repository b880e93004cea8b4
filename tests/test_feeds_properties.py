"""Property-based round-trip for the RSS parser (sources/feeds.py):
generated items → built feed XML (escaped links/titles, random field order
noise via optional guid, pretty-printing) → parse_feed_items → exact
recovery, including the latest-per-link collapse over two shuffled polls."""

from xml.sax.saxutils import escape

from hypothesis import given, settings
from hypothesis import strategies as st

from etherscan_contract_crawler_spark.sources.feeds import (
    latest_per_link,
    parse_feed_items,
)

link_tail = st.text(alphabet="abcXY01-._~?=&", min_size=1, max_size=16)
title_txt = st.text(alphabet="abc XYZ&<>'\"09", min_size=0, max_size=20)

item = st.fixed_dictionaries(
    {
        "tail": link_tail,
        "title": title_txt,
        "guid": st.one_of(st.none(), st.from_regex(r"g[0-9a-f]{1,8}", fullmatch=True)),
        "day": st.integers(min_value=1, max_value=28),
        "pretty": st.booleans(),
    }
)


def build_feed(items):
    out = ["<rss><channel><title>chan</title>"]
    for it in items:
        nl = "\n " if it["pretty"] else ""
        s = f"<item>{nl}<title>{escape(it['title'])}</title>"
        if it["guid"]:
            s += f"{nl}<guid isPermaLink=\"false\">{it['guid']}</guid>"
        s += (
            f"{nl}<link>{escape('https://ex.com/' + it['tail'])}</link>"
            f"{nl}<pubDate>Thu, {it['day']:02d} Jan 2027 10:00:00 GMT</pubDate>"
            f"{nl}</item>"
        )
        out.append(s)
    out.append("</channel></rss>")
    return "".join(out)


@settings(max_examples=10, deadline=None)
@given(st.lists(item, min_size=1, max_size=10))
def test_rss_roundtrip_and_collapse(spark, items):
    # unique link per item (index suffix), so recovery is exactly checkable
    for i, it in enumerate(items):
        it["tail"] = f"{it['tail']}_{i}"
    df = spark.createDataFrame(
        [("f", build_feed(items))], "feed_url string, xml string"
    )
    got = {
        r["link"]: r for r in parse_feed_items(df).collect()
    }
    assert len(got) == len(items)
    # the parser trims element text and maps empty to NULL (absent ≡ empty)
    norm = lambda s: (s.strip() or None) if s is not None else None  # noqa: E731
    for it in items:
        r = got[f"https://ex.com/{it['tail']}"]
        assert r["title"] == norm(it["title"])
        assert r["guid"] == it["guid"]
        assert r["pub_ts"].day == it["day"] and r["pub_ts"].year == 2027

    # two polls of the same items, poll 2 a day newer: collapse keeps poll 2
    p2 = [dict(it, day=min(it["day"] + 1, 28), title=it["title"] + "!") for it in items]
    both = spark.createDataFrame(
        [("f", build_feed(items)), ("f", build_feed(p2))],
        "feed_url string, xml string",
    )
    latest = {r["link"]: r for r in latest_per_link(parse_feed_items(both)).collect()}
    assert len(latest) == len(items)
    for it, it2 in zip(items, p2):
        winner = latest[f"https://ex.com/{it['tail']}"]
        if it2["day"] > it["day"]:
            assert winner["title"] == norm(it2["title"])
        else:  # day 28 tie: guid/title struct tiebreak — just assert one won
            assert winner["title"] in (norm(it["title"]), norm(it2["title"]))
