"""Feed-poll streaming leg (streaming/feedpoll.py): two overlapping polls
drained through one checkpoint — re-announced links must not duplicate
into the frontier (watermark tier + durable-seen tier), restarts must
process only new documents, dateless items are dropped by this leg."""

import pytest

from etherscan_contract_crawler_spark.storage.icetable import SnapshotTable
from etherscan_contract_crawler_spark.streaming.feedpoll import (
    FEED_SEEN_DDL,
    run_feed_poll_to_frontier,
)

FRONTIER_DDL = "url string, priority double, depth int"


def _feed(items):
    body = "\n".join(
        "<item>\n"
        f"  <title>{t}</title>\n"
        f"  <link>{link}</link>\n"
        + (f"  <pubDate>Thu, {day} Jan 2026 00:00:00 GMT</pubDate>\n"
           if day else "")
        + "</item>"
        for t, link, day in items
    )
    return f'<?xml version="1.0"?>\n<rss><channel>\n{body}\n</channel></rss>'


@pytest.mark.slow
def test_feed_poll_exactly_once(spark, tmp_path):
    feed_dir = tmp_path / "feeds"
    feed_dir.mkdir()
    frontier = SnapshotTable(str(tmp_path / "frontier"))
    frontier.create(FRONTIER_DDL)
    seen = SnapshotTable(str(tmp_path / "fseen"))
    seen.create(FEED_SEEN_DDL)

    (feed_dir / "poll1.xml").write_text(_feed([
        ("A", "https://x.com/a", "01"),
        ("B", "https://x.com/b", "01"),
        ("A again same poll", "https://x.com/a", "01"),  # intra-poll dup
        ("no date -> dropped by this leg", "https://x.com/nodate", None),
    ]))
    q = run_feed_poll_to_frontier(
        spark, str(feed_dir), str(tmp_path / "ckpt"), frontier, seen)
    q.awaitTermination(180)
    got = {r["url"] for r in frontier.read(spark).collect()}
    assert got == {"https://x.com/a", "https://x.com/b"}

    # poll 2 re-announces B (newer date) and adds C; restart on the same
    # checkpoint drains only the new file, and B stays single in the frontier
    (feed_dir / "poll2.xml").write_text(_feed([
        ("B updated", "https://x.com/b", "08"),
        ("C", "https://x.com/c", "08"),
    ]))
    q2 = run_feed_poll_to_frontier(
        spark, str(feed_dir), str(tmp_path / "ckpt"), frontier, seen)
    q2.awaitTermination(180)
    rows = frontier.read(spark).collect()
    urls = sorted(r["url"] for r in rows)
    assert urls == ["https://x.com/a", "https://x.com/b", "https://x.com/c"]
    assert seen.read(spark).count() == 3
    # the newer announcement carries a larger recency bonus
    pri = {r["url"]: r["priority"] for r in rows}
    assert pri["https://x.com/c"] > pri["https://x.com/a"] > 0.5
