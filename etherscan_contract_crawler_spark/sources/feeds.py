"""RSS feed ingest — the crawl's CHANGE-discovery source.

Sitemaps (sources/sitemap.py) enumerate a site's URL space; feeds announce
what changed since the last poll. A production crawler polls feeds on the
recrawl cadence (operators/recrawl.py lanes) and merges the announced items
into the frontier — the reference's analog is re-walking the first listing
pages for new entries (contract_crawler.py:316-325); a feed is the
structured version of exactly that.

Same Spark-first shape as the sitemap parser: the fetched feed documents
arrive as one string column, ``regexp_extract_all`` lifts the ``<item>``
blocks, ``explode`` fans out, per-field ``regexp_extract`` projections pull
link/title/guid/pubDate — all JVM built-ins, a single codegen'd projection,
zero shuffles in the parse itself.

The one semantic feeds add over sitemaps: POLLS OVERLAP. A feed carries the
N most recent items, so consecutive polls re-announce most of them, and the
same link can appear with a newer pubDate after an update.
:func:`latest_per_link` collapses that to one row per link (newest pubDate
wins) — a single max_by hash aggregate, partial map-side, no window.

pubDate is RFC-822 (``Thu, 01 Jan 2026 00:00:07 GMT``); the day-of-week
token is presentational and locale-bound, so parsing strips it and reads
``dd MMM yyyy HH:mm:ss`` — tolerant of the wrong weekday name real feeds
routinely ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.sources.sitemap import xml_unescape

_ITEM_BLOCK_RE = r"(?s)<item\b[^>]*>(.*?)</item>"
_LINK_RE = r"(?s)<link>\s*(.*?)\s*</link>"
_TITLE_RE = r"(?s)<title>\s*(.*?)\s*</title>"
_GUID_RE = r"(?s)<guid[^>]*>\s*(.*?)\s*</guid>"
_PUBDATE_RE = r"(?s)<pubDate>\s*(.*?)\s*</pubDate>"

def _text_or_null(block, pattern: str):
    got = F.regexp_extract(block, pattern, 1)
    return F.when(got != "", got)


def parse_feed_items(
    feeds: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("feed_url",),
) -> DataFrame:
    """One row per ``<item>``: (keep_cols..., link, title, guid, pub_ts).
    Items without a parseable ``<link>`` are dropped (nothing to crawl);
    an unparseable pubDate yields a NULL pub_ts, never a task failure."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_ITEM_BLOCK_RE), 1)
    exploded = feeds.select(*keep_cols, F.explode(blocks).alias("_block"))
    block = F.col("_block")
    date_body = F.regexp_extract(
        _text_or_null(block, _PUBDATE_RE),
        r"(?:[A-Za-z]{3},\s*)?(\d{1,2} [A-Za-z]{3} \d{4} \d{1,2}:\d{2}:\d{2})",
        1,
    )
    return (
        exploded.select(
            *keep_cols,
            xml_unescape(_text_or_null(block, _LINK_RE)).alias("link"),
            xml_unescape(_text_or_null(block, _TITLE_RE)).alias("title"),
            _text_or_null(block, _GUID_RE).alias("guid"),
            F.to_timestamp(
                F.when(date_body != "", date_body), "d MMM yyyy H:mm:ss"
            ).alias("pub_ts"),
        )
        .where(F.col("link").isNotNull())
    )


def latest_per_link(items: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Collapse overlapping polls: one row per link, newest pubDate wins
    (guid as the deterministic tiebreak for equal timestamps).

    ONE hash aggregate with map-side partials — no window, no sort: at
    feed-poll scale (every domain × every lane × every poll) this runs on
    the full announcement log, so the agg's shuffle carries one row per
    (link, partial) instead of the log itself.
    """
    pick = F.struct(F.col("pub_ts"), F.col("guid"), *[F.col(c) for c in keep_cols],
                    F.col("title"))
    agg = items.groupBy("link").agg(F.max(pick).alias("_best"))
    out_cols = [F.col("link"), F.col("_best.pub_ts").alias("pub_ts"),
                F.col("_best.guid").alias("guid"), F.col("_best.title").alias("title")]
    out_cols[3:3] = [F.col(f"_best.{c}").alias(c) for c in keep_cols]
    return agg.select(*out_cols)
